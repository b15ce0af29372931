"""Pure-numpy parity kernels.

Each kernel transcribes the *semantics* of a reference algorithm (cited by
file:line in its docstring) with identical f64 arithmetic, so Spark-side
results can be pinned bit-for-bit in tests. No Spark imports here.
"""

from whitebox_tools_spark.kernels.geometry import (  # noqa: F401
    is_clockwise_order,
    point_in_poly,
    points_in_polygon_feature,
    polygon_area,
    polygon_perimeter,
    winding_number,
)
from whitebox_tools_spark.kernels.transforms import (  # noqa: F401
    col_from_x,
    row_from_y,
    x_from_col,
    y_from_row,
)
from whitebox_tools_spark.kernels.frs import (  # noqa: F401
    frs_knn_search,
    frs_radius_search,
)
from whitebox_tools_spark.kernels.tile import tile_assign  # noqa: F401
from whitebox_tools_spark.kernels.idw import idw_value  # noqa: F401
