"""CLI mirroring the reference's command surface (reference cli.py):

  detect DATA_PATH [--field F] [--limit N] [--output CSV|JSON dir]
  benchmark
  methods
  verify MODEL [--provider P] [--api-key K] [--api-base B] [--responses PQ]
  audit --teacher T --student S --responses PARQUET [--report PATH]
  compare --model-a A --model-b B --responses PARQUET [--method M]
  cache list|clear --cache-dir DIR

verify's live path needs httpx (guarded import; absent in this
environment, where the call fail-fasts with ImportError); audit/compare
and verify --responses take a responses parquet with
(model_id, probe_seq, probe_id, category, response) — the same relation a
ProbeSource produces.
"""

from __future__ import annotations

import argparse
import sys


def _spark():
    from model_audit_spark.session import get_spark

    return get_spark(app_name="model-audit-spark-cli")


def cmd_detect(args) -> int:
    from pyspark.sql import functions as F

    from model_audit_spark.engine import AuditEngine
    from model_audit_spark.operators.detect import detection_distribution
    from model_audit_spark.sources import read_texts, write_csv, write_json

    spark = _spark()
    texts = read_texts(spark, args.data_path, args.field)
    if args.limit:
        texts = texts.limit(args.limit)
    texts = texts.select(
        F.monotonically_increasing_id().alias("text_id"), "text"
    )
    short = texts.filter(F.size(F.split("text", r"\s+")) < 10).count()
    if short:
        print(f"warning: {short} texts have <10 words", file=sys.stderr)
    det = AuditEngine(spark).detect(texts)
    det.select(
        "text_id", "text_preview", "predicted_model", "confidence"
    ).show(20, truncate=60)
    print("\nsource distribution:")
    detection_distribution(det).show(20, truncate=False)
    if args.output:
        out = det.select(
            "text_id", "text_preview", "predicted_model", "confidence"
        )
        if args.output.endswith(".json"):
            write_json(out, args.output, single_file=True)
        else:
            write_csv(out, args.output, single_file=True)
        print(f"wrote {args.output}")
    return 0


def cmd_curate(args) -> int:
    from pyspark.sql import functions as F

    from model_audit_spark.operators.curate import curate_corpus
    from model_audit_spark.sources import read_texts, write_csv, write_json

    spark = _spark()
    texts = read_texts(spark, args.data_path, args.field).select(
        F.monotonically_increasing_id().alias("doc_id"), "text"
    )
    verdicts = curate_corpus(
        texts,
        min_quality=args.min_quality,
        langs=tuple(args.langs.split(",")),
        min_jaccard=args.min_jaccard,
    )
    print("drop reasons:")
    verdicts.groupBy("drop_reason").count().orderBy(
        F.desc("count")
    ).show(truncate=False)
    if args.output:
        kept = texts.join(
            verdicts.filter("kept").select("doc_id"), "doc_id"
        ).select("doc_id", "text")
        if args.output.endswith(".json"):
            write_json(kept, args.output, single_file=True)
        else:
            write_csv(kept, args.output, single_file=True)
        print(f"wrote kept docs to {args.output}")
    return 0


def cmd_dedup(args) -> int:
    """Near-duplicate keep-list over any corpus file: minhash → LSH →
    Jaccard verify → connected components → per-doc keep verdict."""
    from pyspark.sql import functions as F

    from model_audit_spark.operators.cluster import cluster_documents
    from model_audit_spark.operators.dedup import (
        jaccard_verify,
        minhash_band_pairs,
        minhash_signatures,
    )
    from model_audit_spark.sources import read_texts, write_csv, write_json

    spark = _spark()
    texts = read_texts(spark, args.data_path, args.field).select(
        F.monotonically_increasing_id().alias("doc_id"), "text"
    )
    sigs = minhash_signatures(texts, "text", "doc_id")
    pairs = minhash_band_pairs(sigs, "doc_id")
    verified = jaccard_verify(
        texts, pairs, "text", "doc_id", min_jaccard=args.min_jaccard
    ).select("id_a", "id_b")
    clusters = cluster_documents(texts, verified, "doc_id")
    n_total = clusters.count()
    n_keep = clusters.filter("keep").count()
    print(f"documents: {n_total}, kept: {n_keep}, "
          f"duplicates dropped: {n_total - n_keep}")
    if args.output:
        out = clusters.select("doc_id", "cluster_id", "keep")
        if args.output.endswith(".json"):
            write_json(out, args.output, single_file=True)
        else:
            write_csv(out, args.output, single_file=True)
        print(f"wrote keep-list to {args.output}")
    return 0


def cmd_rollup(args) -> int:
    """Hierarchical time rollup of an events parquet (minute→hour→day)."""
    from model_audit_spark.operators.rollup import rollup_cascade
    from model_audit_spark.sources.readers import normalize_event_ts
    from model_audit_spark.sources import write_csv, write_json

    spark = _spark()
    ev = normalize_event_ts(
        spark.read.parquet(args.data_path), args.ts_col
    )
    out = rollup_cascade(
        ev, args.ts_col, args.keys.split(","), args.value_col
    )
    out.groupBy("level").count().orderBy("level").show()
    if args.output:
        if args.output.endswith(".json"):
            write_json(out, args.output, single_file=True)
        else:
            write_csv(out, args.output, single_file=True)
        print(f"wrote rollup to {args.output}")
    return 0


def cmd_benchmark(args) -> int:
    from pyspark.sql import functions as F

    from model_audit_spark.catalogs import benchmark_df
    from model_audit_spark.engine import AuditEngine

    spark = _spark()
    bench = benchmark_df(spark)
    det = AuditEngine(spark).detect(bench, "text", "text_id")
    joined = det.join(bench.select("text_id", "label"), "text_id")
    acc = joined.agg(
        F.count("*").alias("total"),
        F.sum((F.col("predicted_model") == F.col("label")).cast("int")).alias(
            "correct"
        ),
    ).first()
    print(f"accuracy: {acc.correct}/{acc.total}")
    joined.groupBy("label").agg(
        F.avg(
            (F.col("predicted_model") == F.col("label")).cast("double")
        ).alias("accuracy")
    ).orderBy("label").show(20, truncate=False)
    return 0 if acc.correct == acc.total else 1


def cmd_methods(args) -> int:
    from model_audit_spark.registry import list_methods

    for name, kind in list_methods().items():
        print(f"{name}\t{kind}")
    return 0


def _load_responses(spark, path):
    return spark.read.parquet(path)


def cmd_verify(args) -> int:
    """Mirror of reference cli.py:142-177 `verify`: probe the model (or
    read a responses parquet), style-score, compare the claimed family
    against the best match."""
    from model_audit_spark.engine import AuditEngine
    from model_audit_spark.probing import HTTPProbeSource, StaticResponseSource

    spark = _spark()
    if args.responses:
        source = StaticResponseSource(_load_responses(spark, args.responses))
    else:
        source = HTTPProbeSource(
            provider=args.provider,
            api_key=args.api_key,
            api_base=args.api_base,
        )
    print(f"verifying {args.model} (provider: {args.provider})...")
    try:
        row = AuditEngine(spark, source).verify(args.model).collect()[0]
    except Exception as e:  # noqa: BLE001 — CLI boundary, mirror reference
        print(f"error: {e}", file=sys.stderr)
        return 1
    if "reason" in row.__fields__:
        print(f"✗ verification failed: {row.reason}", file=sys.stderr)
        return 1
    icon = "✓" if row.verified else "✗"
    print(f"\n{icon} identity {'verified' if row.verified else 'NOT verified'}")
    print(f"  claimed model: {args.model} (family: {row.claimed_family})")
    print(f"  best match:    {row.best_match} (score: {row.best_score})")
    print(f"  claimed score: {row.claimed_score}")
    return 0 if row.verified else 1


def cmd_audit(args) -> int:
    from model_audit_spark.engine import AuditEngine
    from model_audit_spark.probing import StaticResponseSource
    from model_audit_spark.report import generate_report

    spark = _spark()
    resp = _load_responses(spark, args.responses)
    eng = AuditEngine(spark, StaticResponseSource(resp))
    result = eng.audit(args.teacher, args.student)
    md = generate_report(result, fmt=args.format)
    if args.report:
        with open(args.report, "w", encoding="utf-8") as f:
            f.write(md)
        print(f"wrote {args.report}")
    else:
        print(md)
    return 0


def cmd_compare(args) -> int:
    from model_audit_spark.engine import AuditEngine
    from model_audit_spark.probing import StaticResponseSource

    spark = _spark()
    resp = _load_responses(spark, args.responses)
    eng = AuditEngine(spark, StaticResponseSource(resp))
    eng.compare(args.model_a, args.model_b, args.method).show(
        truncate=False
    )
    return 0


def cmd_cache(args) -> int:
    from model_audit_spark.sources.cache import FingerprintCache

    spark = _spark()
    cache = FingerprintCache(spark, args.cache_dir)
    if args.action == "list":
        entries = cache.list_entries()
        if entries is None:
            print("cache empty")
        else:
            entries.show(100, truncate=False)
    else:
        print(f"cleared {cache.clear()} entries")
    return 0


def cmd_mcp(args) -> int:
    from model_audit_spark.mcp_server import MCPServer

    MCPServer(_spark()).serve()
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="model-audit-spark",
        description="PySpark-native LLM fingerprinting / distillation audit",
    )
    sub = p.add_subparsers(dest="command", required=True)

    d = sub.add_parser("detect", help="detect which family wrote each text")
    d.add_argument("data_path")
    d.add_argument("--field")
    d.add_argument("--limit", type=int)
    d.add_argument("--output")
    d.set_defaults(fn=cmd_detect)

    cu = sub.add_parser(
        "curate", help="training-data curation: lang/quality/dedup verdicts"
    )
    cu.add_argument("data_path")
    cu.add_argument("--field")
    cu.add_argument("--min-quality", type=float, default=0.5)
    cu.add_argument("--langs", default="en")
    cu.add_argument("--min-jaccard", type=float, default=0.5)
    cu.add_argument("--output")
    cu.set_defaults(fn=cmd_curate)

    dd = sub.add_parser(
        "dedup", help="near-duplicate keep-list (minhash LSH + clusters)"
    )
    dd.add_argument("data_path")
    dd.add_argument("--field")
    dd.add_argument("--min-jaccard", type=float, default=0.5)
    dd.add_argument("--output")
    dd.set_defaults(fn=cmd_dedup)

    ro = sub.add_parser(
        "rollup", help="minute/hour/day rollup cascade over events parquet"
    )
    ro.add_argument("data_path")
    ro.add_argument("--ts-col", default="ts")
    ro.add_argument("--keys", default="event_type")
    ro.add_argument("--value-col", default="value")
    ro.add_argument("--output")
    ro.set_defaults(fn=cmd_rollup)

    b = sub.add_parser("benchmark", help="14-sample accuracy gate")
    b.set_defaults(fn=cmd_benchmark)

    m = sub.add_parser("methods", help="list fingerprint methods")
    m.set_defaults(fn=cmd_methods)

    v = sub.add_parser(
        "verify", help="verify the model behind an API is what it claims"
    )
    v.add_argument("model", help="model name (e.g. gpt-4o, claude-3-opus)")
    v.add_argument(
        "-p", "--provider", default="openai",
        choices=["openai", "anthropic", "custom"],
    )
    v.add_argument("--api-key", default="")
    v.add_argument("--api-base", default="")
    v.add_argument(
        "--responses",
        help="responses parquet (offline; skips live probing)",
    )
    v.set_defaults(fn=cmd_verify)

    a = sub.add_parser("audit", help="teacher/student distillation audit")
    a.add_argument("--teacher", required=True)
    a.add_argument("--student", required=True)
    a.add_argument("--responses", required=True, help="responses parquet")
    a.add_argument("--report", help="write markdown report here")
    a.add_argument("--format", default="markdown", choices=["markdown", "json"])
    a.set_defaults(fn=cmd_audit)

    c = sub.add_parser("compare", help="compare two models with one method")
    c.add_argument("--model-a", required=True)
    c.add_argument("--model-b", required=True)
    c.add_argument("--method", default="llmmap")
    c.add_argument("--responses", required=True)
    c.set_defaults(fn=cmd_compare)

    k = sub.add_parser("cache", help="fingerprint cache admin")
    k.add_argument("action", choices=["list", "clear"])
    k.add_argument("--cache-dir", required=True)
    k.set_defaults(fn=cmd_cache)

    s = sub.add_parser("mcp", help="serve audit tools over MCP stdio")
    s.set_defaults(fn=cmd_mcp)
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
