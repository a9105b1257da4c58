"""IO roundtrips: parquet/csv/json/orc sources and sinks, DNF filters,
column pruning, scan-sharing cache (reference io/tests/test_io.py model)."""

from __future__ import annotations

import os

import pandas as pd
import pytest

from conftest import SF_DIR, assert_frame_eq


@pytest.fixture()
def pdf():
    return pd.DataFrame({
        "a": range(50),
        "b": [float(i) * 1.5 for i in range(50)],
        "c": [["x", "y", "z"][i % 3] for i in range(50)],
    })


def test_parquet_roundtrip(spark, pdf, tmp_path):
    import pandas_expr_spark as pes
    p = str(tmp_path / "t.parquet")
    pes.from_pandas(pdf).to_parquet(p)
    back = pes.read_parquet(p)
    assert_frame_eq(back, pdf, sort_by=["a"])


def test_parquet_partitioned_write(spark, pdf, tmp_path):
    import pandas_expr_spark as pes
    p = str(tmp_path / "part.parquet")
    pes.from_pandas(pdf).to_parquet(p, partition_by=["c"])
    # hive-partitioned layout on disk
    assert any(d.startswith("c=") for d in os.listdir(p))
    back = pes.read_parquet(p)
    got = back.compute()
    assert len(got) == 50
    # partition pruning: filter on the partition column
    sub = back[back.c == "x"].compute()
    assert (sub["c"] == "x").all()


def test_parquet_dnf_filters_and_columns(spark, pdf, tmp_path):
    import pandas_expr_spark as pes
    p = str(tmp_path / "f.parquet")
    pes.from_pandas(pdf).to_parquet(p)
    got = pes.read_parquet(p, columns=["a", "b"],
                           filters=[("a", ">", 10), ("a", "<=", 20)]).compute()
    want = pdf[(pdf.a > 10) & (pdf.a <= 20)][["a", "b"]]
    assert_frame_eq(got, want, sort_by=["a"])
    # OR-of-ANDs DNF
    got2 = pes.read_parquet(
        p, filters=[[("a", "<", 5)], [("a", ">=", 45)]]).compute()
    assert len(got2) == 10


def test_scan_cache_shares_lineage(spark, pdf, tmp_path):
    import pandas_expr_spark as pes
    p = str(tmp_path / "s.parquet")
    pes.from_pandas(pdf).to_parquet(p)
    d1 = pes.read_parquet(p)
    d2 = pes.read_parquet(p)
    # same lowered Spark scan object → self-references share one scan and
    # same-lineage binops need no alignment join
    assert d1._sdf is d2._sdf


def test_csv_roundtrip(spark, pdf, tmp_path):
    import pandas_expr_spark as pes
    p = str(tmp_path / "t.csv")
    pes.from_pandas(pdf).to_csv(p)
    back = pes.read_csv(p, header=True, inferSchema=True)
    assert_frame_eq(back, pdf, sort_by=["a"])


def test_json_roundtrip(spark, pdf, tmp_path):
    import pandas_expr_spark as pes
    p = str(tmp_path / "t.json")
    pes.from_pandas(pdf).to_json(p)
    back = pes.read_json(p)
    got = back.compute().sort_values("a").reset_index(drop=True)
    assert (got["a"] == pdf["a"]).all() and (got["c"] == pdf["c"]).all()


def test_orc_roundtrip(spark, pdf, tmp_path):
    import pandas_expr_spark as pes
    p = str(tmp_path / "t.orc")
    pes.from_pandas(pdf).to_orc(p)
    back = pes.read_orc(p)
    assert_frame_eq(back, pdf, sort_by=["a"])


def test_sorted_parquet_layout_prunes(spark, tmp_path):
    """Range-clustered write -> disjoint per-file min/max on the sort key
    (the property that makes parquet footer stats actually prune)."""
    import glob
    import pyarrow.parquet as pq
    import pandas_expr_spark as pes

    li = pes.read_parquet(f"{SF_DIR}/lineitem.parquet")
    out = str(tmp_path / "li_sorted")
    li.to_sorted_parquet(out, "l_orderkey", num_files=4)

    ranges = []
    for f in glob.glob(f"{out}/part-*.parquet"):
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx["l_orderkey"]).statistics
            mins.append(st.min); maxs.append(st.max)
        ranges.append((min(mins), max(maxs)))
    ranges.sort()
    assert len(ranges) >= 3  # range partitioner produced multiple files
    for (a_lo, a_hi), (b_lo, b_hi) in zip(ranges, ranges[1:]):
        assert a_hi <= b_lo  # disjoint key ranges -> file-level pruning


def test_read_text_lines_and_whole(spark, tmp_path):
    import pandas_expr_spark as pes
    d = tmp_path / "txts"
    d.mkdir()
    (d / "a.txt").write_text("line1\nline2\n")
    (d / "b.txt").write_text("only\n")
    lines = pes.read_text(str(d)).compute()
    assert sorted(lines["value"]) == ["line1", "line2", "only"]
    whole = pes.read_text(str(d), whole=True).compute()
    assert len(whole) == 2
    joined = {p.rsplit("/", 1)[-1]: v for p, v in
              zip(whole["path"], whole["value"])}
    assert joined["a.txt"] == "line1\nline2\n"


def test_read_binary_glob_and_payload(spark, tmp_path):
    import pandas_expr_spark as pes
    d = tmp_path / "bins"
    d.mkdir()
    (d / "x.img").write_bytes(b"\x89IMG\x00\x01")
    (d / "y.img").write_bytes(b"\x89IMG\x00\x02\x03")
    (d / "skip.txt").write_text("nope")
    df = pes.read_binary(str(d), path_glob="*.img")
    out = df.compute()
    assert len(out) == 2
    assert sorted(out["length"]) == [6, 7]
    payloads = sorted(bytes(b) for b in out["content"])
    assert payloads[0].startswith(b"\x89IMG")
    # feeds the multimodal plumbing directly
    from pandas_expr_spark.functions import multimodal
    meta = multimodal.attach_media_meta(
        df.to_spark().selectExpr("path as media_id", "content as payload"))
    assert meta.count() == 2
