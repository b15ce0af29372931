"""Spark operators — the engine's public surface.

Each module re-expresses one reference operator family (SURVEY.md section 2)
as DataFrame transforms; parity semantics are delegated to
``whitebox_tools_spark.kernels`` where numpy is required.
"""
