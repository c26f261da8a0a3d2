"""ShapeNet-55 data pipeline parity against the ACTUAL reference loader.

The generative metrics are only comparable if both frameworks feed the
models byte-identical clouds: same file ordering, same seed-38383 shuffle,
same unit-sphere normalization and shift/scale bookkeeping, same
train/test point splits (including the reference's tr-from-full-15k quirk,
ShapeNet_55.py:150-153). This runs the reference's torch Dataset and ours
over the same (synthetic) PC15k tree and compares every deterministic field
per index.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
DATA = "data/ShapeNetCore.v2.PC15k"
if not os.path.isdir(REF):
    pytest.skip("reference tree unavailable", allow_module_level=True)
if not os.path.isdir(DATA):
    pytest.skip("synthetic PC15k tree unavailable", allow_module_level=True)
if REF not in sys.path:
    sys.path.append(REF)

# The repo's own `datasets/` dir (ViPC lists) shadows the reference's
# namespace package of the same name — load the module by file path.
import importlib.util  # noqa: E402

_spec = importlib.util.spec_from_file_location(
    "_ref_shapenet55", os.path.join(REF, "datasets", "ShapeNet_55.py"))
_ref_mod = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_ref_mod)
RefDataset = _ref_mod.ShapeNet15kPointClouds

from ldt_tpu.data.shapenet55 import (  # noqa: E402
    ShapeNet15kPointClouds as MyDataset,
)


# Per-cloud comparison is keyed by model id, NOT by index: the reference
# iterates raw `os.listdir` order (ShapeNet_55.py:86), which is
# filesystem-dependent — the reference's own index<->cloud mapping is not
# reproducible across machines. We sort the listing (documented divergence,
# README); the seed-38383 shuffle and all per-cloud processing are
# identical, and the set-level metrics (MMD/COV/1-NNA/JSD) are
# order-insensitive.


def _by_mid(ds):
    return {ds[i]["mid"]: ds[i] for i in range(len(ds))}


@pytest.mark.parametrize("split", ["train", "val"])
def test_item_parity(split):
    kw = dict(root_dir=DATA, categories=["airplane"], tr_sample_size=2048,
              te_sample_size=2048, split=split, random_subsample=False,
              boundary=True)
    ref, mine = RefDataset(**kw), MyDataset(**kw)
    assert len(ref) == len(mine) and len(ref) > 0
    want_map, got_map = _by_mid(ref), _by_mid(mine)
    assert set(want_map) == set(got_map)
    for mid, want in want_map.items():
        got = got_map[mid]
        np.testing.assert_allclose(np.asarray(got["tr_points"]),
                                   want["tr_points"].numpy(), atol=1e-6,
                                   err_msg=f"{split}/{mid}.tr_points")
        np.testing.assert_allclose(np.asarray(got["te_points"]),
                                   want["te_points"].numpy(), atol=1e-6,
                                   err_msg=f"{split}/{mid}.te_points")
        np.testing.assert_allclose(np.asarray(got["shift"]),
                                   np.asarray(want["shift"]), atol=1e-6)
        np.testing.assert_allclose(np.asarray(got["scale"]),
                                   np.asarray(want["scale"]), atol=1e-6)
        assert int(got["cate_idx"]) == int(want["cate_idx"])
        assert got["sid"] == want["sid"]


def test_unnormalized_parity():
    kw = dict(root_dir=DATA, categories=["airplane"], tr_sample_size=2048,
              te_sample_size=2048, split="val", random_subsample=False,
              boundary=False)
    ref, mine = RefDataset(**kw), MyDataset(**kw)
    want_map, got_map = _by_mid(ref), _by_mid(mine)
    assert set(want_map) == set(got_map)
    for mid, want in want_map.items():
        got = got_map[mid]
        np.testing.assert_allclose(np.asarray(got["tr_points"]),
                                   want["tr_points"].numpy(), atol=1e-6)
        np.testing.assert_allclose(np.asarray(got["scale"]),
                                   np.asarray(want["scale"]), atol=1e-6)
