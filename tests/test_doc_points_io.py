"""doc_points layout: range partitioning, row-group stats, scan pruning."""

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from geo_spark.index.cells import cell_encode
from geo_spark.operators.extract import extract_points
from geo_spark.sources.documents import synth_documents
from geo_spark.sources.io import cells_between, read_doc_points, write_doc_points


@pytest.fixture(scope="module")
def doc_points_path(spark):
    d = tempfile.mkdtemp(prefix="geo_spark_docpts_")
    path = os.path.join(d, "doc_points.parquet")
    docs = synth_documents(spark, 20_000)
    pts = extract_points(docs)
    write_doc_points(pts, path, num_partitions=8)
    yield path
    shutil.rmtree(d, ignore_errors=True)


def test_cell_columns_match_kernel(spark, doc_points_path):
    df = read_doc_points(spark, doc_points_path)
    pdf = df.limit(2000).toPandas()
    for r in (4, 8, 12):
        exp = cell_encode(pdf["lon"].to_numpy(), pdf["lat"].to_numpy(), r)
        assert (pdf[f"cell_r{r}"].to_numpy() == exp).all()


def test_files_are_range_partitioned_and_sorted(spark, doc_points_path):
    import pyarrow.parquet as pq

    files = [
        os.path.join(doc_points_path, f)
        for f in os.listdir(doc_points_path)
        if f.endswith(".parquet")
    ]
    assert len(files) >= 4
    ranges = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        idx = md.schema.to_arrow_schema().get_field_index("cell_r8")
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        # sorted within file → row-group ranges are non-overlapping & ordered
        for k in range(len(mins) - 1):
            assert maxs[k] <= mins[k + 1]
        ranges.append((min(mins), max(maxs)))
    # range partitioning → file ranges are (nearly) disjoint
    ranges.sort()
    for k in range(len(ranges) - 1):
        assert ranges[k][1] <= ranges[k + 1][0]


def test_cell_range_scan_prunes(spark, doc_points_path):
    df = read_doc_points(spark, doc_points_path)
    lo = int(df.agg(F.min("cell_r8")).collect()[0][0])
    pred = cells_between(8, lo, lo + 1)
    plan = df.filter(pred)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "cell_r8" in plan
    # filter actually selects a strict subset
    assert df.filter(pred).count() < df.count()
