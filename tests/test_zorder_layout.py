"""Z-order clustered layout (operators/scale.py): the interleave math,
and the property that actually matters — a z-clustered write gives
file-level min/max pruning on BOTH dimensions, where a single-column
sort only prunes its leading column."""

from __future__ import annotations

import glob

import duckdb

from amazon_textract_enhancer_spark.operators import scale as S

SF_DIR = "/root/testdata/sf0.01"


def _interleave_py(u1: int, u2: int, bits: int = 16) -> int:
    z = 0
    for b in range(bits):
        z |= ((u1 >> b) & 1) << (2 * b + 1)
        z |= ((u2 >> b) & 1) << (2 * b)
    return z


def test_zorder_key_matches_pure_python(spark):
    rows = S.layout_zorder_key(spark, SF_DIR).limit(50).collect()
    assert len(rows) == 50
    for r in rows:
        assert r["zkey"] == _interleave_py(r["u_chars"], r["u_lang"])


def _file_stats(path_glob: str):
    """Per parquet file: (n_chars min, n_chars max, distinct langs)."""
    out = []
    for f in sorted(glob.glob(path_glob)):
        lo, hi, langs = duckdb.sql(
            f"SELECT min(n_chars), max(n_chars), count(DISTINCT lang) "
            f"FROM read_parquet('{f}')"
        ).fetchone()
        out.append((lo, hi, langs))
    return out


def test_zorder_layout_prunes_both_dimensions(spark, tmp_path):
    """Write the documents table (a) z-clustered on (n_chars, lang)
    and (b) range-sorted on n_chars alone, same file count. The
    z-layout must confine each lang to far fewer files (equality
    pruning on the second dim) while still keeping per-file n_chars
    ranges well below the global range (range pruning on the first).
    n_chars is scaled into the top of the 16-bit space so both
    dimensions own high interleave bits (the Delta OPTIMIZE ZORDER
    range-id trick, done here with a fixed scale)."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_files = 16

    zdir = str(tmp_path / "z")
    S.zorder_layout(
        docs, "least(n_chars * 64, 65535)", S._ZORDER_U2_SPARK, n_files
    ).write.parquet(zdir)

    sdir = str(tmp_path / "s")
    (
        docs.repartitionByRange(n_files, "n_chars")
        .sortWithinPartitions("n_chars")
        .write.parquet(sdir)
    )

    zstats = _file_stats(f"{zdir}/part-*.parquet")
    sstats = _file_stats(f"{sdir}/part-*.parquet")
    assert len(zstats) > 4  # range partitioner may coalesce empties

    # dim 2 (lang): total (file x lang) incidence — the number of
    # files a point query `lang = X` must read, summed over langs
    z_incidence = sum(s[2] for s in zstats)
    s_incidence = sum(s[2] for s in sstats)
    assert z_incidence < s_incidence, (zstats, sstats)

    # dim 1 (n_chars): per-file ranges still prune — the average file
    # covers well under the full span (a plain lang-bucketed layout
    # would cover ~all of it in every file)
    glo = min(s[0] for s in zstats)
    ghi = max(s[1] for s in zstats)
    spans = [(hi - lo) for lo, hi, _ in zstats]
    assert sum(spans) / len(spans) < 0.7 * (ghi - glo), zstats
