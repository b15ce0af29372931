"""Native geospatial format codecs (GeoTIFF, Shapefile, LAS, ASCII grids).

Pure-numpy/struct encoders + decoders with Spark integration:
- read: ``spark.read.format("binaryFile")`` -> ``mapInPandas`` decode, so
  a directory of tiles/flightlines decodes fully in parallel (one task
  per file — the natural 100-TB layout is many files);
- write: a single-file writer for small outputs plus a partitioned
  writer (one file per grid band / per partition) that encodes on the
  executors for scale.

Reference parity anchors (behavior, not code): GeoTIFF tag handling
src/raster/geotiff/mod.rs:214 (read) / :1564 (write); Shapefile record
layout src/vector/shapefile/mod.rs:37-66; LAS header + point formats
src/lidar/las.rs:558-640; ArcASCII header src/raster/arcascii_raster.rs:19-99.
"""

from whitebox_tools_spark.io.ascii_grid import (  # noqa: F401
    decode_arcascii,
    encode_arcascii,
    read_arcascii,
    write_arcascii,
)
from whitebox_tools_spark.io.geotiff import (  # noqa: F401
    decode_geotiff,
    encode_geotiff,
    read_geotiff,
    read_geotiff_config,
    write_geotiff,
    write_geotiff_tiles,
)
from whitebox_tools_spark.io.las import (  # noqa: F401
    decode_las,
    encode_las,
    read_las,
    write_las,
    write_las_tiles,
)
from whitebox_tools_spark.io.whitebox_raster import (  # noqa: F401
    decode_whitebox,
    encode_whitebox,
    read_whitebox,
    write_whitebox,
)
from whitebox_tools_spark.io.shapefile import (  # noqa: F401
    decode_shapefile,
    encode_shapefile,
    read_shapefile,
    write_shapefile,
)
