"""Sources: deterministic synthetic tables + parquet loaders.

The engine's canonical input is the interleaved text+media document table
(``docs.py``); TPC-H-ish parquet fixtures under /root/testdata are loaded
with ``tables.py``. Raster grids are *generated* (cells are arithmetic,
never stored externally) in ``rasters.py``; polygon fixture layers live in
``vectors.py``.
"""
