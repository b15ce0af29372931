"""Reference-shaped user facade.

The reference exposes 395+ uniform snake_case wrappers on one class
(``whitebox_tools.py:1063`` style: ``wbt.d8_flow_accumulation(...)``).
``WhiteboxSpark`` gives reference users the same entry point over this
engine: every registered tool name (CamelCase or snake_case) resolves to
the implementing operator function through the coverage registry, so

    wbt = WhiteboxSpark(spark)
    wbt.idw_interpolation(points, grid_cfg, radius=60.0, ...)

calls ``operators.gridding.idw_grid`` — the exact catalog path. The
operators are DataFrame-in/DataFrame-out (no file I/O), which is the one
deliberate signature difference from the reference's path-based CLI.
"""

from __future__ import annotations

import importlib
import re
from typing import Callable

from whitebox_tools_spark.registry import TOOLS


def to_snakecase(name: str) -> str:
    """CamelCase -> snake_case, same rule the reference wrapper generator
    uses (whitebox_tools.py:38-43) so method names line up 1:1."""
    s1 = re.sub("(.)([A-Z][a-z]+)", r"\1_\2", name)
    return re.sub("([a-z0-9])([A-Z])", r"\1_\2", s1).lower()


_SNAKE_TO_TOOL: dict[str, str] = {to_snakecase(k): k for k in TOOLS}

_PATH_RE = re.compile(r"\b((?:operators|kernels|sources|io)\.[A-Za-z0-9_]+\.[A-Za-z0-9_]+)")


def _resolve(engine: str) -> Callable:
    """First dotted operator path in a registry engine note -> callable."""
    m = _PATH_RE.search(engine)
    if not m:
        raise NotImplementedError(
            f"no single operator function backs this tool; use the named "
            f"machinery directly: {engine}"
        )
    path = m.group(1)
    mod_path, func = path.rsplit(".", 1)
    mod = importlib.import_module(f"whitebox_tools_spark.{mod_path}")
    fn = getattr(mod, func, None)
    if not callable(fn):
        raise NotImplementedError(
            f"registry points at {path} which is not a callable; engine note: {engine}"
        )
    return fn


class WhiteboxSpark:
    """One object, every tool: ``WhiteboxSpark(spark).<snake_case_tool>``.

    Attribute access returns the implementing operator function (bound to
    nothing — operators take DataFrames, not paths). ``tool_info`` gives
    the registry row (status / engine note / catalog queries) so users can
    see parity status before trusting a result.
    """

    def __init__(self, spark):
        self.spark = spark

    # -- introspection ----------------------------------------------------
    def list_tools(self, keyword: str = "") -> list[str]:
        kw = keyword.lower()
        return sorted(s for s in _SNAKE_TO_TOOL if kw in s)

    def tool_info(self, name: str) -> dict:
        tool = _SNAKE_TO_TOOL.get(name, name if name in TOOLS else None)
        if tool is None:
            raise KeyError(f"unknown tool: {name!r}")
        row = dict(TOOLS[tool])
        row["tool"] = tool
        return row

    def tool(self, name: str) -> Callable:
        return _resolve(self.tool_info(name)["engine"])

    # -- the uniform wrapper surface --------------------------------------
    def __getattr__(self, name: str) -> Callable:
        if name.startswith("_") or name in ("spark",):
            raise AttributeError(name)
        try:
            return self.tool(name)
        except KeyError:
            raise AttributeError(f"unknown tool: {name!r}") from None

    def __dir__(self):
        return sorted(set(super().__dir__()) | set(_SNAKE_TO_TOOL))
