"""Index integrity checker (pisa_ray/fsck.py)."""

import glob
import random
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _tbl(n=200, seed=5):
    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(25)]
    return pa.table(
        {
            "doc_id": pa.array(list(range(1, n + 1)), type=pa.int64()),
            "text": pa.array(
                [" ".join(rng.choice(vocab) for _ in range(15)) for _ in range(n)]
            ),
        }
    )


def _build(tmp_path, name, **kw):
    from pisa_ray.build import IndexConfig, build_index

    idx = str(tmp_path / name)
    build_index(
        _tbl(),
        idx,
        IndexConfig(
            id_col="doc_id", content_col="text", meta_cols=(),
            bucket_bits=2, term_parts=8, lineage_parts=1, **kw,
        ),
        resume=False,
    )
    return idx


@pytest.mark.parametrize("codec", ["varint", "packed"])
def test_fsck_clean_index(tmp_path, codec):
    from pisa_ray.fsck import check_index

    idx = _build(tmp_path, f"ok_{codec}", codec=codec, positions=True)
    rep = check_index(idx)
    assert rep["ok"], rep["errors"]
    assert rep["checked"]["segment_runs"] > 0
    assert rep["checked"]["docmap_rows"] == 200
    assert rep["checked"]["codec"] == codec


def test_fsck_detects_df_corruption_and_lexicon_drift(tmp_path):
    from pisa_ray.fsck import check_index

    idx = _build(tmp_path, "bad")
    f = sorted(glob.glob(f"{idx}/segments/**/*.parquet", recursive=True))[0]
    t = pq.read_table(f)
    dfs = t["df"].to_pylist()
    dfs[0] += 5
    t = t.set_column(
        t.schema.get_field_index("df"), "df", pa.array(dfs, type=pa.uint64())
    )
    pq.write_table(t, f)
    rep = check_index(idx)
    assert not rep["ok"]
    joined = "\n".join(rep["errors"])
    assert "df=" in joined and "lexicon != segment sums" in joined


def test_fsck_detects_missing_pieces(tmp_path):
    from pisa_ray.fsck import check_index

    idx = _build(tmp_path, "gone")
    shutil.rmtree(f"{idx}/lexicon")
    rep = check_index(idx)
    assert not rep["ok"]
    assert any("lexicon/ missing" in e for e in rep["errors"])
    # stats gone -> structured failure, not a traceback
    shutil.copy(f"{idx}/manifest.json", "/tmp/_m.json")
    import os

    os.remove(f"{idx}/stats.json")
    rep2 = check_index(idx)
    assert not rep2["ok"] and any("stats.json missing" in e for e in rep2["errors"])
