"""Engine-level stats ops not directly SQL-oracled (PCA eigen stage)."""

import numpy as np

from whitebox_tools_spark import derive
from whitebox_tools_spark.operators.stats import pca
from whitebox_tools_spark.sources.tables import documents

SF_DIR = "/root/testdata/sf0.001"


class TestPCA:
    def test_matches_numpy_cov_eig(self, spark):
        geo = derive.with_geometry(documents(spark, SF_DIR), "doc_id")
        vals, vecs, pct = pca(geo, ["x", "y", "z"])

        rows = geo.select("x", "y", "z").collect()
        X = np.array([[r["x"], r["y"], r["z"]] for r in rows])
        c = np.cov(X.T, ddof=1)
        evals = np.sort(np.linalg.eigvalsh(c))[::-1]
        assert np.allclose(vals, evals, rtol=1e-9)
        assert abs(pct.sum() - 100.0) < 1e-9
        # eigenvectors: C v = lambda v
        for i in range(3):
            assert np.allclose(c @ vecs[:, i], vals[i] * vecs[:, i], atol=1e-6)

    def test_explained_sorted_desc(self, spark):
        geo = derive.with_geometry(documents(spark, SF_DIR), "doc_id")
        vals, _, _ = pca(geo, ["x", "y"])
        assert vals[0] >= vals[1]
