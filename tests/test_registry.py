"""Registry consistency: every 'exact' tool's catalog queries exist, and
the registry covers exactly the reference's 424 registered tools."""

from whitebox_tools_spark import api
from whitebox_tools_spark.registry import TOOLS, coverage_summary


def test_full_tool_count():
    assert len(TOOLS) == 424


def test_statuses_valid():
    assert set(v["status"] for v in TOOLS.values()) <= {
        "exact",
        "deviating",
        "engine",
        "expr",
        "deferred",
    }


def test_exact_tools_have_live_queries():
    for name, meta in TOOLS.items():
        if meta["status"] == "exact":
            for q in (q.strip() for q in meta["queries"].split(",")):
                assert q in api.QUERIES, f"{name}: query {q} not in catalog"
                assert q in api.ORACLE_SQL, f"{name}: query {q} has no oracle"


def test_coverage_floor():
    s = coverage_summary()
    assert s["exact"] >= 350
    # round 4 eliminated the 'expr' (indirect-only) status: every tool now
    # carries a dedicated oracle row (exact/deviating) or is engine-backed
    assert s.get("expr", 0) == 0
    assert (
        s["exact"] + s.get("engine", 0) + s.get("deviating", 0) >= 420
    )


def test_no_engine_status_io_tools_remain():
    """Round-4 gate: the four io tools that were 'engine' (pytest-only)
    now carry oracle rows; no io.* tool may regress to oracle-less."""
    for name in ("AsciiToLas", "LasToShapefile", "LasToMultipointShapefile",
                 "PrintGeoTiffTags"):
        assert TOOLS[name]["status"] == "exact", name
        assert TOOLS[name].get("queries"), name


def test_registry_notes_match_code():
    """Note-hygiene pins (VERDICT r3 item 8): the notes must describe the
    actual implementation, not an approximation of it."""
    # PercentageContrastStretch uses exact percentile(), not approx
    note = TOOLS["PercentageContrastStretch"]["engine"]
    assert "percentile_approx" not in note
    assert "percentile" in note
    # io rows state their format envelope truthfully
    assert "0-10" in TOOLS["LasToAscii"]["engine"]  # LAS point formats
    assert "BigTIFF" in TOOLS["ConvertRasterFormat"]["engine"]


def test_deviating_rows_cite_reference_lines():
    """Every 'deviating' registry row must carry the reference file:line
    that proves the deviation is the reference's approximation/defect,
    not the engine's (VERDICT r4 'What's wrong' #3). The registry is the
    coverage map of record; a new deviating row without a cite fails."""
    import re

    deviating = {k: v for k, v in TOOLS.items() if v["status"] == "deviating"}
    assert len(deviating) >= 23  # the round-4 set; growth is fine
    missing = [k for k, v in deviating.items()
               if not re.search(r"\.rs:\d", v["engine"])]
    assert missing == [], f"deviating rows without a reference cite: {missing}"
