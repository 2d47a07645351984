"""Method registry — decorator factory mirroring reference registry.py:9-36.

Strategies are DataFrame-transformers (see methods.py), not row-at-a-time
fingerprinters: `fingerprint` maps a responses relation to a fingerprint
relation, `compare` maps fingerprints to comparison rows. `style` is
deliberately NOT registered, matching the reference (mcp_server.py:78
advertises it but registry.py:27-29 raises — documented divergence list,
SURVEY.md §7.4 item 6)."""

from __future__ import annotations

_REGISTRY: dict[str, type] = {}


def register(name: str):
    def decorator(cls: type):
        _REGISTRY[name] = cls
        return cls

    return decorator


def get_fingerprinter(name: str, **kwargs):
    """Instantiate a registered method; ValueError lists what exists."""
    # ensure built-in methods are registered
    import model_audit_spark.methods  # noqa: F401

    if name not in _REGISTRY:
        available = ", ".join(sorted(_REGISTRY))
        raise ValueError(f"unknown method: {name}. available: {available}")
    return _REGISTRY[name](**kwargs)


def list_methods() -> dict[str, str]:
    """{name: fingerprint_type} for every registered method."""
    import model_audit_spark.methods  # noqa: F401

    return {
        name: cls().fingerprint_type for name, cls in sorted(_REGISTRY.items())
    }
