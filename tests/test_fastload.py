"""Native bulk .npy loader vs np.load (differential + fallback semantics)."""

import os

import numpy as np
import pytest

from ldt_tpu.data import fastload


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    d = tmp_path_factory.mktemp("npys")
    rng = np.random.RandomState(0)
    paths, want = [], []
    for i in range(7):
        p = str(d / f"m{i}.npy")
        arr = rng.randn(50, 3).astype(np.float32)
        np.save(p, arr)
        paths.append(p)
        want.append(arr)
    return paths, np.stack(want), d


def test_bitexact_vs_np_load(tree):
    paths, want, _ = tree
    got, ok = fastload.load_npy_batch(paths, (50, 3))
    assert ok.all()
    np.testing.assert_array_equal(got, want)


def test_native_built(tree):
    # g++ is in the image; the JIT build must succeed and be cached
    assert fastload.native_available()
    assert os.path.exists(fastload._LIB)


def test_fallback_float64_and_failures(tree):
    paths, want, d = tree
    p64 = str(d / "f64.npy")
    np.save(p64, np.arange(150, dtype=np.float64).reshape(50, 3))
    bad_shape = str(d / "bad.npy")
    np.save(bad_shape, np.zeros((3, 3), np.float32))
    missing = str(d / "nope.npy")
    got, ok = fastload.load_npy_batch(
        [paths[0], p64, bad_shape, missing], (50, 3))
    # f64 rejected by the native parser but recovered via np.load + astype
    assert list(ok) == [True, True, False, False]
    np.testing.assert_array_equal(got[0], want[0])
    np.testing.assert_array_equal(
        got[1], np.arange(150, dtype=np.float64).reshape(50, 3)
        .astype(np.float32))


def test_same_elems_wrong_shape_rejected(tree):
    """Transposed / flattened files with a COINCIDENTALLY equal element
    count must not load scrambled through the native path (it validates the
    full shape tuple, not just the product)."""
    import pytest

    paths, want, d = tree
    transposed = str(d / "t.npy")
    np.save(transposed, np.zeros((3, 50), np.float32))   # 150 elems
    flat = str(d / "flat.npy")
    np.save(flat, np.zeros((150,), np.float32))           # 150 elems
    got, ok = fastload.load_npy_batch([paths[0], transposed, flat], (50, 3))
    assert list(ok) == [True, False, False]
    np.testing.assert_array_equal(got[0], want[0])
    with pytest.raises(ValueError, match="shape"):
        fastload.load_npy_batch([transposed], (50, 3), strict_shape=True)


def test_strict_shape_raises(tree):
    """Readable-but-wrong-shape files fail loudly under strict_shape (the
    reference hard-asserts 15000 points after a successful load,
    ShapeNet_55.py:101); unreadable files are still just masked out."""
    import pytest

    paths, _, d = tree
    bad_shape = str(d / "bad2.npy")
    np.save(bad_shape, np.zeros((3, 3), np.float32))
    missing = str(d / "nope2.npy")
    with pytest.raises(ValueError, match="shape"):
        fastload.load_npy_batch([paths[0], bad_shape], (50, 3),
                                strict_shape=True)
    _, ok = fastload.load_npy_batch([paths[0], missing], (50, 3),
                                    strict_shape=True)
    assert list(ok) == [True, False]


def test_dataset_uses_bulk_loader(tmp_path):
    """Uniform15KPC end-to-end over the bulk path: same content + the
    seed-38383 shuffle as before."""
    from ldt_tpu.data.shapenet55 import ShapeNet15kPointClouds

    rng = np.random.RandomState(1)
    d = tmp_path / "PC15k" / "02691156" / "train"
    d.mkdir(parents=True)
    clouds = {}
    for i in range(4):
        arr = rng.randn(15000, 3).astype(np.float32)
        np.save(d / f"m{i}.npy", arr)
        clouds[f"train/m{i}"] = arr
    ds = ShapeNet15kPointClouds(
        root_dir=str(tmp_path / "PC15k"), categories=("airplane",),
        split="train", tr_sample_size=64, te_sample_size=64, boundary=False)
    assert len(ds) == 4
    for idx in range(4):
        _, mid = ds.all_cate_mids[idx]
        np.testing.assert_array_equal(ds.all_points[idx], clouds[mid])
