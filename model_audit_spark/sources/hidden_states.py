"""S11 whitebox hidden-state source (reference methods/reef.py:72-128).

Produces the long `hidden_states(model_id, layer INT, sample INT, vec
ARRAY<DOUBLE>)` relation that layer_cka / reef_compare consume, via
applyInPandas grouped by model_id — one model load per group, Arrow
batches in and out, no per-row Python round trips.

Reference extraction semantics mirrored exactly:
- AutoTokenizer/AutoModel with output_hidden_states, pad_token falls back
  to eos_token;
- batch tokenize with padding + truncation at max_length=512;
- per-layer mean pooling over the attention mask (pad positions excluded,
  divisor clamped to >= 1);
- when num_layers < total, layers are sampled uniformly:
  idx_i = int(i * (total-1) / (num_layers-1)).

torch/transformers are OPTIONAL (the reference gates them behind a
`whitebox` extra; neither is in this environment) — they import inside
the kernel at call time, and a `loader(model_id, texts) ->
[layer][sample][dim]` is injectable so the Spark plumbing is fully
testable with a fake tiny model.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable

from pyspark.sql import DataFrame

HIDDEN_SCHEMA = "model_id STRING, layer INT, sample INT, vec ARRAY<DOUBLE>"


def uniform_layer_indices(total: int, num_layers: int | None) -> list[int]:
    """Uniform layer sample (reference reef.py:114-118): includes both the
    embedding layer (0) and the last layer; all layers when num_layers is
    None or >= total."""
    if not num_layers or num_layers >= total:
        return list(range(total))
    if num_layers == 1:
        return [0]
    return [
        int(i * (total - 1) / (num_layers - 1)) for i in range(num_layers)
    ]


def _hf_extract(
    model_id: str, texts: list[str], max_length: int = 512
) -> list[list[list[float]]]:
    """Live HF path: returns [layer][sample][dim] pooled hidden states.
    Imports torch/transformers at call time (optional 'whitebox' deps)."""
    try:
        import torch
        from transformers import AutoModel, AutoTokenizer
    except ImportError as e:
        raise ImportError(
            "torch + transformers are required for whitebox hidden-state "
            "extraction (pip install torch transformers)"
        ) from e

    tokenizer = AutoTokenizer.from_pretrained(model_id)
    model = AutoModel.from_pretrained(model_id, output_hidden_states=True)
    model.eval()
    if tokenizer.pad_token is None:
        tokenizer.pad_token = tokenizer.eos_token
    inputs = tokenizer(
        texts,
        return_tensors="pt",
        padding=True,
        truncation=True,
        max_length=max_length,
    )
    with torch.no_grad():
        outputs = model(**inputs)
    mask = inputs["attention_mask"].unsqueeze(-1).float()
    result = []
    for hs in outputs.hidden_states:
        pooled = (hs * mask).sum(dim=1) / mask.sum(dim=1).clamp(min=1)
        result.append(pooled.cpu().tolist())
    return result


def extract_hidden_states(
    texts: DataFrame,
    num_layers: int | None = None,
    max_length: int = 512,
    model_col: str = "model_id",
    sample_col: str = "sample",
    text_col: str = "text",
    loader: Callable[[str, list[str]], Iterable] | None = None,
) -> DataFrame:
    """(model_id, sample, text) -> hidden_states(model_id, layer, sample,
    vec). One applyInPandas group per model_id: the model loads once per
    group, every text in the group runs through one padded batch (matching
    the reference, which batches all probe texts together), and the pooled
    layers explode into long rows. Uniform layer sampling applies to
    whatever the loader returns, so the fake-loader test path and the live
    HF path share it."""
    import pandas as pd

    def _extract(pdf: "pd.DataFrame") -> "pd.DataFrame":
        model_id = pdf[model_col].iloc[0]
        pdf = pdf.sort_values(sample_col)
        tlist = ["" if t is None else str(t) for t in pdf[text_col]]
        samples = list(pdf[sample_col])
        layers = (
            loader(model_id, tlist)
            if loader is not None
            else _hf_extract(model_id, tlist, max_length)
        )
        layers = [list(layer) for layer in layers]
        keep = uniform_layer_indices(len(layers), num_layers)
        rows = []
        for out_idx, li in enumerate(keep):
            layer = layers[li]
            for s in range(len(samples)):
                rows.append(
                    (
                        model_id,
                        out_idx,
                        samples[s],
                        [float(x) for x in layer[s]],
                    )
                )
        return pd.DataFrame(
            rows, columns=["model_id", "layer", "sample", "vec"]
        )

    return texts.groupBy(model_col).applyInPandas(_extract, HIDDEN_SCHEMA)
