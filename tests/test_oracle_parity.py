"""Every queries() entry with an oracle must hash-match DuckDB — this is
the same gate the driver runs (CORRECTNESS_r{N}.json), run at sf0.001 for
speed (driver uses sf0.01)."""

import os

import pytest

from tests.conftest import SF_DIR

# the ANN oracles train artifacts from parquet; point them at the suite's
# sf dir BEFORE oracle_sql() runs (the external driver uses the sf0.01
# default)
os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = SF_DIR

import __spark_entry__ as entrymod  # noqa: E402
from tests.oracle_harness import compare, duck_connection  # noqa: E402

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.schema is not None


@pytest.mark.parametrize("name", sorted(ORACLES.keys()))
def test_oracle_parity(spark, sf_dir, duck, name):
    assert name in QUERIES, f"oracle_sql has {name} but queries() doesn't"
    df = QUERIES[name](spark, sf_dir)
    ok, msg = compare(df, ORACLES[name], duck)
    assert ok, f"{name}: {msg}"


def test_every_query_runs(spark, sf_dir):
    for name, fn in QUERIES.items():
        df = fn(spark, sf_dir)
        assert df.count() >= 0, name


def test_training_sample_spark_vs_pyarrow(spark):
    """The oracle-side pyarrow sample (ORDER BY id) must be bit-identical
    to the Spark-side orderBy(id).limit(n) sample — this is what makes the
    ANN oracles sound (same sample ⇒ same seeded trainer ⇒ same model)."""
    import numpy as np

    from vecgo_spark import oracle_artifacts as arts
    from vecgo_spark.quantization.pq import _sample_vectors
    from vecgo_spark.sources.registry import load_table

    sf = "/root/testdata/sf0.01"
    emb = load_table(spark, sf, "embeddings")
    x_spark = _sample_vectors(emb, "embedding", 20_000, order_col="vec_id")
    x_arrow = arts.training_sample(sf, max_rows=20_000)
    assert x_spark.shape == x_arrow.shape
    assert np.array_equal(x_spark, x_arrow)


def test_trained_models_identical(spark):
    """Spark-path trainers and oracle_artifacts trainers produce
    bit-identical models from the deterministic sample."""
    import numpy as np

    from vecgo_spark import oracle_artifacts as arts
    from vecgo_spark.operators import ivf
    from vecgo_spark.quantization import pq as pqz
    from vecgo_spark.sources.registry import load_table

    sf = "/root/testdata/sf0.01"
    emb = load_table(spark, sf, "embeddings")
    m_spark = ivf.train_ivf(emb, "embedding", nlist=8, max_iter=10, trainer="driver",
                            max_train_rows=20_000, order_col="vec_id")
    m_arrow = arts.ivf_model(sf)
    assert np.array_equal(m_spark.centroids, m_arrow.centroids)

    pq_spark = pqz.train_pq(emb, "embedding", m=8, k=256, iters=8,
                            max_train_rows=20_000, order_col="vec_id")
    pq_arrow = arts.pq_books(sf)
    assert np.array_equal(pq_spark.codebooks, pq_arrow.codebooks)
