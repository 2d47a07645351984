"""Pure Column-builder expression library (zero Python UDFs on the hot path)."""
