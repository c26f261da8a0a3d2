"""Golden-eval harness with synthetic stand-ins (VERDICT r1 #2b).

Fabricates a tiny ShapeNet tree + 'released samples' + a reference-format
val.txt, then checks golden_eval reproduces the rows (and catches a
perturbed one)."""

import os

import numpy as np
import pytest
import yaml

import golden_eval
import val_sample
from ldt_tpu.tools.io import dict2namespace

N_PTS = 64


@pytest.fixture()
def golden_ws(tmp_path, monkeypatch):
    root = tmp_path
    rng = np.random.RandomState(7)
    data_dir = root / "PC15k"
    for split in ("train", "val"):
        d = data_dir / "02691156" / split
        d.mkdir(parents=True)
        for i in range(4):
            np.save(d / f"m{i}.npy", rng.randn(15000, 3).astype(np.float32))
    cfg = dict(
        data=dict(cates=["airplane"], num_categorys=1,
                  tr_max_sample_points=N_PTS, te_max_sample_points=N_PTS,
                  data_dir=str(data_dir), batch_size=2, test_batch_size=2,
                  boundary=True, num_workers=0))
    os.makedirs(root / "test")
    with open(root / "test" / "val_config.yaml", "w") as f:
        yaml.safe_dump(cfg, f)
    # 'released samples': the refs jittered slightly -> near-but-not-exact
    monkeypatch.chdir(root)
    loaders_args = dict2namespace(dict(eval_split="val"))
    from ldt_tpu.data import get_data_loaders

    cfg_ns = dict2namespace(cfg)
    loaders = get_data_loaders(cfg_ns.data, loaders_args)
    refs = np.concatenate([b["te_points"] for b in loaders["test_loader"]])
    smp = refs + 0.01 * rng.randn(*refs.shape).astype(np.float32)
    os.makedirs("test/smp/airplane")
    np.save("test/smp/airplane/gen.npy", smp)
    return root


def _write_reference_style_val_txt(path, res):
    """Reference format: INFO:root: prefixes + lgan_ key names."""
    remap = {"mmd-CD": "lgan_mmd-CD", "cov-CD": "lgan_cov-CD",
             "mmd_smp-CD": "lgan_mmd_smp-CD"}
    with open(path, "w") as f:
        f.write("INFO:root:airplane:gen.npy\n")
        for k, v in res.items():
            name = k.replace("val/gen/", "")
            name = remap.get(name, name)
            f.write(f"INFO:root:[val/gen/{name}] {v:.8f}\n")


def test_golden_eval_reproduces_and_detects(golden_ws):
    cfg = dict2namespace(yaml.safe_load(
        open(golden_ws / "test" / "val_config.yaml")))
    args = dict2namespace(dict(sample="gen.npy", dataset="airplane",
                               sample_path="smp", norm=False,
                               eval_split="val"))
    res = val_sample.main(args, cfg)
    _write_reference_style_val_txt(golden_ws / "golden_val.txt", res)

    blocks = golden_eval.parse_val_txt(str(golden_ws / "golden_val.txt"))
    assert len(blocks) == 1
    ds, sample_file, metrics = blocks[0]
    assert ds == "airplane" and sample_file == "gen.npy"
    assert set(metrics) == {"mmd-CD", "cov-CD", "mmd_smp-CD",
                            "1-NN-CD-acc_t", "1-NN-CD-acc_f", "1-NN-CD-acc"}

    ga = golden_eval.get_parser().parse_args(
        ["--val_txt", str(golden_ws / "golden_val.txt"),
         "--config", str(golden_ws / "test" / "val_config.yaml"),
         "--tol", "0.01"])
    assert golden_eval.run(ga) == 0

    # perturb one recorded value by 5% -> must FAIL at 1% tolerance
    lines = open(golden_ws / "golden_val.txt").read().splitlines()
    out = []
    for ln in lines:
        if "1-NN-CD-acc]" in ln:
            val = float(ln.rsplit(" ", 1)[1])
            # additive perturbation: the metric may legitimately be 0.0 here
            # (near-identical sets -> 1-NNA fully confused)
            ln = ln.rsplit(" ", 1)[0] + f" {val + 0.05:.8f}"
        out.append(ln)
    open(golden_ws / "golden_val.txt", "w").write("\n".join(out) + "\n")
    assert golden_eval.run(ga) == 1


def test_parse_reference_val_txt_verbatim():
    """The actual reference val.txt (if present in the image) parses into
    the expected blocks — guards the regexes against format drift."""
    path = "/root/reference/val.txt"
    if not os.path.exists(path):
        pytest.skip("reference val.txt not in image")
    blocks = golden_eval.parse_val_txt(path)
    assert len(blocks) >= 3
    names = [b[0] for b in blocks]
    assert {"airplane", "car", "chair"} <= set(names)
    airplane = next(b for b in blocks if b[0] == "airplane")
    assert airplane[2]["1-NN-CD-acc"] == pytest.approx(0.56172842)
    assert airplane[2]["mmd-CD"] == pytest.approx(0.00080392)
