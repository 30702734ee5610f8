"""Table IO: CSV ingestion, partitioned/sorted parquet layout, read_table
roundtrip (ref out-of-core HDFStore contract, iterators_and_indexers.py:
219-221 — re-expressed as pruned/pushed scans over an explicit layout)."""

import glob
import os

import pandas as pd

from deepgraph_spark.sources import read_csv, read_table, write_table, write_transcripts

PDF = pd.DataFrame(
    {"id": [0, 1, 2, 3], "grp": ["a", "a", "b", "b"], "x": [1.5, 2.5, 3.5, 4.5]}
)


def test_read_csv(spark, tmp_path):
    p = str(tmp_path / "v.csv")
    PDF.to_csv(p, index=False)
    df = read_csv(spark, p)
    got = df.toPandas().sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, PDF, check_dtype=False)
    assert dict(df.dtypes)["x"] == "double"  # inferSchema


def test_write_read_table_partitioned(spark, tmp_path):
    loc = str(tmp_path / "t.parquet")
    write_table(
        spark.createDataFrame(PDF), loc,
        partition_by=["grp"], sort_within_partitions=["id"],
    )
    # physical layout: one directory per partition value (pruning unit)
    assert sorted(os.path.basename(d) for d in glob.glob(f"{loc}/grp=*")) == ["grp=a", "grp=b"]
    got = read_table(spark, loc).toPandas().sort_values("id").reset_index(drop=True)
    assert got.x.tolist() == PDF.x.tolist()


def test_write_transcripts_layout(spark, tmp_path):
    from deepgraph_spark.datagen import generate_transcripts

    loc = str(tmp_path / "tr.parquet")
    tr = generate_transcripts(spark, n_turns=200, seed=7)
    write_transcripts(tr, loc, buckets=4)
    assert len(glob.glob(f"{loc}/conv_bucket=*")) >= 2
    back = read_table(spark, loc)
    assert back.count() == 200
    # per-turn text equality under the new layout (input_hint invariant)
    a = tr.select("conv_id", "turn_idx", "text").toPandas().set_index(["conv_id", "turn_idx"]).sort_index()
    b = back.select("conv_id", "turn_idx", "text").toPandas().set_index(["conv_id", "turn_idx"]).sort_index()
    assert (a.text == b.text).all()
