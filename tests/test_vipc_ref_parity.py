"""ViPC data pipeline parity against the ACTUAL reference loader.

The completion task's input contract lives in `datasets/ViPC.py`: the
view-metadata rotation chain aligning the partial cloud to the image view
(:261-274) and the joint GT-centroid/max-radius normalization (:276-283).
This runs the reference Dataset and ours over the same synthetic ViPC tree
with `view_align=True, preload=False` (the deterministic configuration —
no random view draw) and compares `pc`/`pc_part` per index. The image
branch is neutralized on the reference side (its torchvision transform is
overridden) — image decoding parity is torchvision-implementation detail,
not contract.
"""

import os
import pickle
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
pytest.importorskip("PIL")

REF = "/root/reference"
if not os.path.isdir(REF):
    pytest.skip("reference tree unavailable", allow_module_level=True)
if REF not in sys.path:
    sys.path.append(REF)

# --- shims the reference module needs on this image ------------------------
from test_port import _install_shims  # noqa: E402 (fps + Tensor.to + tv)

_install_shims()

if "torchvision.transforms" not in sys.modules:
    tvt = types.ModuleType("torchvision.transforms")

    class _Inert:
        def __init__(self, *a, **k):
            pass

        def __call__(self, x):
            return x

    class _Compose(_Inert):
        def __init__(self, fns, *a, **k):
            pass

    tvt.Compose = _Compose
    tvt.Resize = _Inert
    tvt.ToTensor = _Inert
    tvt.Normalize = _Inert
    sys.modules["torchvision.transforms"] = tvt
    sys.modules["torchvision"].transforms = tvt

import importlib.util  # noqa: E402

_spec = importlib.util.spec_from_file_location(
    "_ref_vipc", os.path.join(REF, "datasets", "ViPC.py"))
_ref_mod = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_ref_mod)
RefViPC = _ref_mod.ViPCDataLoader

from ldt_tpu.data.vipc import ViPCDataLoader as MyViPC  # noqa: E402

SYNSET = "02691156"


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("vipc_parity")
    rng = np.random.RandomState(7)
    lines = []
    for mid in ("mA", "mB"):
        gt = root / "ShapeNetViPC-GT" / SYNSET / mid
        part = root / "ShapeNetViPC-Partial" / SYNSET / mid
        view = root / "ShapeNetViPC-View" / SYNSET / mid / "rendering"
        for d in (gt, part, view):
            d.mkdir(parents=True)
        meta = np.zeros((24, 5), np.float32)
        meta[:, 0] = np.arange(24) * 13.0 + 5.0   # varied theta
        meta[:, 1] = np.arange(24) % 7 * 9.0      # varied phi
        np.savetxt(str(view / "rendering_metadata.txt"), meta)
        for v in range(24):
            vv = str(v).rjust(2, "0")
            with open(gt / f"{vv}.dat", "wb") as f:
                pickle.dump(rng.randn(300, 3).astype(np.float32), f)
            with open(part / f"{vv}.dat", "wb") as f:
                pickle.dump(rng.randn(150, 3).astype(np.float32), f)
            Image.fromarray((rng.rand(8, 8, 3) * 255).astype(
                np.uint8)).save(view / f"{vv}.png")
        for v in ("00", "07", "19"):
            lines.append(f"{SYNSET};{mid};{v}\n")
    lst = root / "list.txt"
    lst.write_text("".join(lines))
    return root, lst


def test_item_parity_view_align(tree):
    root, lst = tree
    kw = dict(filepath=str(lst), data_path=str(root), status="test",
              pc_input_num=400, view_align=True, category="plane",
              preload=False)
    ref = RefViPC(**kw)
    ref.transform = lambda img: torch.zeros(3, 4, 4)  # neutralize image
    mine = MyViPC(**kw)
    assert len(ref) == len(mine) == 6
    for idx in range(len(ref)):
        _, want_pc, want_part = ref[idx]
        got = mine[idx]
        np.testing.assert_allclose(got["pc"], want_pc.numpy(), atol=1e-6,
                                   err_msg=f"[{idx}].pc")
        np.testing.assert_allclose(got["pc_part"], want_part.numpy(),
                                   atol=1e-6, err_msg=f"[{idx}].pc_part")
