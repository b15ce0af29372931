"""JVM LocalRelation builder for tiny driver-side literal frames.

``spark.createDataFrame(rows)`` plans as a Python-RDD scan
(``applySchemaToPythonRDD``): unknown statistics (so Catalyst picks
sort-merge joins over broadcast), UnknownPartitioning, and every re-scan
of the frame re-runs a Python worker to unpickle the rows — worth
seconds of fixed overhead per query for fixture layers of a few rows.

``local_df`` instead renders the rows as a ``VALUES`` SQL literal, which
parses to a LocalRelation: fully JVM-side, sized (broadcastable), and
free to re-scan. Only for *small* literal data (the SQL text is O(data);
keep it under a few thousand rows — fixture layers, viewpoint lists,
scalar results).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession


def _sql_lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, int):
        return f"CAST({v} AS BIGINT)"
    if isinstance(v, float):
        if math.isnan(v):
            return "CAST('NaN' AS DOUBLE)"
        if math.isinf(v):
            return f"CAST('{'-' if v < 0 else ''}Infinity' AS DOUBLE)"
        return f"CAST({v!r} AS DOUBLE)"
    if isinstance(v, str):
        # VALUES inline tables accept only plain literals, so everything
        # must survive Spark's unescapeSQLString: backslash-escape the
        # escape char and quote, \uXXXX-escape controls and non-BMP
        # chars (as surrogate pairs, matching Java's UTF-16 strings)
        out = []
        for ch in v:
            cp = ord(ch)
            if ch == "\\":
                out.append("\\\\")
            elif ch == "'":
                out.append("\\'")
            elif 0x20 <= cp < 0x7F or (0xA0 <= cp <= 0xFFFF and not 0xD800 <= cp <= 0xDFFF):
                out.append(ch)
            elif cp > 0xFFFF:
                cp -= 0x10000
                hi = 0xD800 + (cp >> 10)
                lo = 0xDC00 + (cp & 0x3FF)
                out.append(f"\\u{hi:04X}\\u{lo:04X}")
            else:
                out.append(f"\\u{cp:04X}")
        return "'" + "".join(out) + "'"
    if isinstance(v, (list, tuple)):
        return "array(" + ", ".join(_sql_lit(x) for x in v) + ")"
    # numpy scalars
    for attr in ("item",):
        if hasattr(v, attr):
            return _sql_lit(v.item())
    raise TypeError(f"local_df: unsupported literal type {type(v)!r}")


def local_df(
    spark: SparkSession, rows, columns: list[str] | None = None
) -> DataFrame:
    """LocalRelation from literal rows.

    ``rows`` is a list of dicts sharing the same keys (column order =
    first row's key order) or a list of tuples/lists with ``columns``
    given explicitly. Values: None/bool/int/float/str/list-of-those.
    """
    if not rows:
        raise ValueError("local_df needs at least one row (schema is inferred)")
    if columns is None:
        columns = list(rows[0].keys())
        vals = [[r[c] for c in columns] for r in rows]
    else:
        vals = rows
    if len(vals) > 4000:
        # SQL-literal parse time is O(data); past a few thousand rows the
        # Python-RDD path is the lesser evil.
        import pandas as pd

        return spark.createDataFrame(pd.DataFrame(vals, columns=columns))
    body = ", ".join(
        "(" + ", ".join(_sql_lit(v) for v in row) + ")" for row in vals
    )
    cols = ", ".join(columns)
    return spark.sql(f"SELECT * FROM VALUES {body} AS t({cols})")
