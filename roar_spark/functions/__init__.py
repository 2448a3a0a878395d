"""Reusable column-expression helpers (vector math, text analysis).

All JVM-side built-in expressions — no Python UDFs in any hot path."""
