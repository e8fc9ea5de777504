"""ArrayStore round-trip, resume, and batching semantics."""

import numpy as np
import pytest

from mmd_tpu.data.store import ArrayStore, ArrayStoreWriter, write_store


def test_write_read_roundtrip(tmp_path, rng):
    arrays = {
        "x": rng.standard_normal((10, 4, 3)).astype(np.float16),
        "labels": rng.integers(0, 3, (10, 4)).astype(np.int32),
    }
    store = write_store(tmp_path / "s", arrays)
    assert len(store) == 10
    np.testing.assert_array_equal(store.col("labels"), arrays["labels"])
    sample = store[3]
    np.testing.assert_array_equal(sample["x"], arrays["x"][3])


def test_incremental_writer_resume(tmp_path, rng):
    cols = {"x": ((2,), np.float32)}
    w = ArrayStoreWriter(tmp_path / "s", capacity=8, columns=cols)
    w.append_batch({"x": np.ones((3, 2), np.float32)})
    w.finalize()
    # Re-open: count persists, writing continues where it stopped
    w2 = ArrayStoreWriter(tmp_path / "s", capacity=8, columns=cols)
    assert w2.count == 3
    w2.append_batch({"x": np.full((2, 2), 2.0, np.float32)})
    w2.finalize()
    store = ArrayStore(tmp_path / "s")
    assert len(store) == 5
    np.testing.assert_array_equal(store.col("x")[3], [2.0, 2.0])


def test_batches_fixed_size_and_shuffle(tmp_path, rng):
    arrays = {"x": np.arange(23, dtype=np.float32)[:, None]}
    store = write_store(tmp_path / "s", arrays)
    batches = list(store.batches(8, shuffle=True, seed=1, drop_last=True))
    assert len(batches) == 2 and all(b["x"].shape == (8, 1) for b in batches)
    seen = np.concatenate([b["x"].ravel() for b in batches])
    assert len(np.unique(seen)) == 16  # no duplicates across batches

    padded = list(store.batches(8, drop_last=False))
    assert len(padded) == 3
    last = padded[-1]
    assert last["x"].shape == (8, 1) and last["_pad_mask"].sum() == 7


def test_batches_shuffle_determinism(tmp_path, rng):
    arrays = {"x": np.arange(32, dtype=np.float32)[:, None]}
    store = write_store(tmp_path / "s", arrays)
    a = [b["x"] for b in store.batches(8, shuffle=True, seed=7)]
    b = [b["x"] for b in store.batches(8, shuffle=True, seed=7)]
    c = [b["x"] for b in store.batches(8, shuffle=True, seed=8)]
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
    assert any(not np.array_equal(x, y) for x, y in zip(a, c))


def test_capacity_guard(tmp_path):
    w = ArrayStoreWriter(tmp_path / "s", capacity=2, columns={"x": ((1,), np.float32)})
    w.append_batch({"x": np.zeros((2, 1), np.float32)})
    with pytest.raises(ValueError):
        w.append_batch({"x": np.zeros((1, 1), np.float32)})
