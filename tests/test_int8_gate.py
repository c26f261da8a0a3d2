"""CPU smoke for scripts/int8_golden_gate.py: the gate runs end-to-end on
a tiny experiment dir (config + saved checkpoint + data tree) and emits a
verdict. (The real run is on TPU against the trained flagship — this pins
the script's wiring: checkpoint resolution, env toggling, metric deltas.)"""

import os
import runpy
import sys

import numpy as np
import pytest
import yaml

from ldt_tpu.tools.io import dict2namespace

N_PTS = 64


@pytest.fixture()
def exp_dir(tmp_path):
    root = tmp_path
    data_dir = root / "PC15k"
    rng = np.random.RandomState(0)
    for split in ("train", "val"):
        d = data_dir / "02691156" / split
        d.mkdir(parents=True)
        for i in range(3):
            np.save(d / f"m{i}.npy", rng.randn(15000, 3).astype(np.float32))

    model = dict(
        outsize=N_PTS, max_outputs=N_PTS, input_dim=3, z_dim=4, z_scales=8,
        p_dim=16, n_layers=2, hidden_dim=32, num_heads=2, activation="swish",
        encoder_dropout_p=0.0, decoder_dropout_p=0.0, norm="layer_norm",
        neighbors=8, encoder_layers=1, mlp_ratio=2.0, min_sigma=-30,
        cluster_norm="anchor", norm_input=False, pre_group=False,
        decoder_act=None, ActNorm=True, AdaLN=True, pos_embedding="center",
        class_condition=False, num_categorys=1, pretrain_path=None)
    exp = root / "exp"
    exp.mkdir()
    cfg = dict(
        data=dict(cates=["airplane"], num_categorys=1,
                  tr_max_sample_points=N_PTS, te_max_sample_points=N_PTS,
                  data_dir=str(data_dir), batch_size=2, test_batch_size=2,
                  boundary=True, num_workers=0),
        opt=dict(adj_lr="warm_up", warmup_iters=2, lr=1e-3, beta1=0.9,
                 beta2=0.999, ema_decay=0.99, weight_decay=0.0,
                 grad_norm_clip_value=1.0, kl_weight=1e-6, loss_type="l2",
                 discrete=True),
        log=dict(save_epoch_freq=1, save_path=str(exp), log_epoch_freq=1,
                 eval_epoch_freq=1000,
                 traincolumns=["epoch", "itr", "loss", "time"],
                 trainformat=[None, None, "{:.4f}", "{:.0f}"],
                 evalcolumns=["epoch", "mmd-CD"],
                 evalformat=[None, "{:.8f}"]),
        common=dict(epochs=2, num_points=N_PTS, seed=0),
        model=model, compressor=model,
        score=dict(num_steps=8, z_dim=8, z_scale=8, hidden_size=32,
                   num_heads=4, num_blocks=2, num_categorys=1, t_dim=16,
                   dropout=0.0, norm="layer_norm", learn_sigma=False,
                   act="swish", unet=False, AdaLN=True, condition=False),
        sde=dict(beta_start=0.1, beta_end=20.0, sde_type="vpsde",
                 sigma2_0=0.0, iw_sample_p_mode="drop_all_iw",
                 iw_sample_q_mode="drop_all_iw", time_eps=0.01, ode_tol=1e-4,
                 sample_time_eps=1e-6, sample_mode="discrete",
                 predictor="ancestral", corrector=None, train_N=8,
                 sample_N=32, snr=0.01, corrector_steps=1, denoise=True,
                 probability_flow=False, alpha=1.0),
    )
    with open(exp / "config.yaml", "w") as f:
        yaml.safe_dump(cfg, f)

    # one trained-ish checkpoint + a training.csv whose last epoch (7) has
    # NO checkpoint file — exercises the fall-back-to-newest-on-disk path
    from ldt_tpu.data import get_data_loaders
    from ldt_tpu.models import Compressor, Score
    from ldt_tpu.training.latent_sde_trainer import Trainer

    ns = dict2namespace(cfg)
    ns.log.save_path = str(exp)
    tr = Trainer(ns, Score(ns.score), Compressor(ns.compressor))
    loaders = get_data_loaders(ns.data, dict2namespace(
        dict(eval_split="val")))
    tr.maybe_init(next(iter(loaders["train_loader"])))
    tr.epoch = 5
    tr.save()
    from ldt_tpu.training.checkpoint import wait_pending_saves

    wait_pending_saves()
    with open(exp / "training.csv", "w") as f:
        f.write("epoch,itr,loss,time\n5,10,1.0,3\n7,14,0.9,5\n")
    return exp


def test_gate_runs_and_reports(exp_dir, monkeypatch, capsys):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    # the gate mutates LDT_SERVE_INT8; register it with monkeypatch so the
    # mutation is undone at teardown (must not leak into other tests)
    monkeypatch.setenv("LDT_SERVE_INT8", "0")
    import scripts.int8_golden_gate as gate

    monkeypatch.setattr(sys, "argv",
                        ["gate", "--exp", str(exp_dir), "--num", "4",
                         "--steps", "8", "--threshold", "1.0"])
    rc = gate.main()
    out = capsys.readouterr().out
    # resolved the newest ON-DISK checkpoint (5), not the CSV's 7
    assert "checkpt_5.msgpack" in out
    assert "bf16" in out and "int8" in out
    assert rc in (0, 1)  # random-init numerics may exceed tight thresholds
    assert ("PASSED" in out) or ("FAILED" in out)
    assert os.environ.get("LDT_SERVE_INT8") is not None
    # the gate wrote its verdict stamp next to the checkpoint
    import json

    from ldt_tpu.serving.int8 import gate_stamp_path

    spath = gate_stamp_path(str(exp_dir / "checkpt_5.msgpack"))
    assert os.path.exists(spath), "gate did not write its stamp"
    stamp = json.load(open(spath))
    # per-(checkpoint, sampler-config) entry list (a later gate for another
    # config must not destroy this verdict)
    (entry,) = stamp["entries"]
    assert entry["passed"] == (rc == 0)
    assert entry["sampler"]["sample_N"] == 8  # the --steps override
    assert entry["checkpoint"]["file"] == "checkpt_5.msgpack"

@pytest.fixture()
def completion_exp_dir(tmp_path):
    """ViPC completion experiment dir: tiny tree + config + one saved
    conditional checkpoint (for the gate's --completion mode)."""
    pytest.importorskip("PIL")
    import pickle

    from PIL import Image

    root = tmp_path
    rng = np.random.RandomState(0)
    synset = "02691156"
    lines = []
    for mid in ("mA", "mB"):
        gt = root / "vipc" / "ShapeNetViPC-GT" / synset / mid
        part = root / "vipc" / "ShapeNetViPC-Partial" / synset / mid
        view = root / "vipc" / "ShapeNetViPC-View" / synset / mid / "rendering"
        for d in (gt, part, view):
            d.mkdir(parents=True)
        meta = np.zeros((24, 5), np.float32)
        meta[:, 0] = np.arange(24) * 15.0
        meta[:, 1] = 25.0
        np.savetxt(str(view / "rendering_metadata.txt"), meta)
        for v in range(24):
            vv = str(v).rjust(2, "0")
            with open(gt / f"{vv}.dat", "wb") as f:
                pickle.dump(rng.randn(300, 3).astype(np.float32), f)
            with open(part / f"{vv}.dat", "wb") as f:
                pickle.dump(rng.randn(100, 3).astype(np.float32), f)
            Image.fromarray((rng.rand(16, 16, 3) * 255).astype(
                np.uint8)).save(view / f"{vv}.png")
        lines.append(f"{synset};{mid};00\n")
    for split in ("train_list2.txt", "test_list2.txt"):
        with open(root / "vipc" / split, "w") as f:
            f.writelines(lines)

    model = dict(
        outsize=N_PTS, max_outputs=N_PTS, input_dim=3, z_dim=4, z_scales=8,
        p_dim=16, n_layers=2, hidden_dim=32, num_heads=2, activation="swish",
        encoder_dropout_p=0.0, decoder_dropout_p=0.0, norm="layer_norm",
        neighbors=8, encoder_layers=1, mlp_ratio=2.0, min_sigma=-30,
        cluster_norm="anchor", norm_input=False, pre_group=False,
        decoder_act=None, ActNorm=True, AdaLN=True, pos_embedding="center",
        class_condition=False, num_categorys=1, pretrain_path=None)
    exp = root / "exp"
    exp.mkdir()
    cfg = dict(
        data=dict(type="ldt_tpu.data.vipc", train_cate="plane",
                  test_cate="plane", train_preload=False, test_preload=False,
                  data_dir=str(root / "vipc"),
                  train_list=str(root / "vipc" / "train_list2.txt"),
                  test_list=str(root / "vipc" / "test_list2.txt"),
                  tr_max_sample_points=N_PTS, te_max_sample_points=N_PTS,
                  batch_size=2, test_batch_size=2, num_categorys=1,
                  num_workers=0),
        opt=dict(adj_lr="warm_up", warmup_iters=2, lr=1e-3, beta1=0.9,
                 beta2=0.999, ema_decay=0.99, weight_decay=0.0,
                 grad_norm_clip_value=1.0, kl_weight=1e-6, loss_type="l2",
                 discrete=True),
        log=dict(save_epoch_freq=1, save_path=str(exp), log_epoch_freq=1,
                 eval_epoch_freq=1000,
                 traincolumns=["epoch", "itr", "loss", "time"],
                 trainformat=[None, None, "{:.4f}", "{:.0f}"],
                 evalcolumns=["epoch", "cd", "f1score"],
                 evalformat=[None, "{:.8f}", "{:.8f}"]),
        common=dict(epochs=2, num_points=N_PTS, seed=0),
        model=model, compressor=model,
        score=dict(num_steps=8, z_dim=8, z_scale=8, hidden_size=32,
                   num_heads=4, num_blocks=2, num_categorys=1, t_dim=16,
                   dropout=0.0, norm="layer_norm", learn_sigma=False,
                   act="swish", unet=False, AdaLN=True, condition=True),
        sde=dict(beta_start=0.1, beta_end=20.0, sde_type="vpsde",
                 sigma2_0=0.0, iw_sample_p_mode="drop_all_iw",
                 iw_sample_q_mode="drop_all_iw", time_eps=0.01, ode_tol=1e-4,
                 sample_time_eps=1e-6, sample_mode="discrete",
                 predictor="ancestral", corrector=None, train_N=8,
                 sample_N=32, snr=0.01, corrector_steps=1, denoise=True,
                 probability_flow=False, alpha=1.0),
    )
    with open(exp / "config.yaml", "w") as f:
        yaml.safe_dump(cfg, f)

    from ldt_tpu.data.vipc import get_data_loaders
    from ldt_tpu.models import Compressor, Score
    from ldt_tpu.training.checkpoint import wait_pending_saves
    from ldt_tpu.training.completion_latent_sde_trainer import Trainer

    ns = dict2namespace(cfg)
    ns.log.save_path = str(exp)
    tr = Trainer(ns, Score(ns.score), Compressor(ns.compressor))
    loaders = get_data_loaders(ns.data)
    tr.maybe_init(next(iter(loaders["train_loader"])))
    tr.epoch = 3
    tr.save()
    wait_pending_saves()
    with open(exp / "training.csv", "w") as f:
        f.write("epoch,itr,loss,time\n3,6,1.0,3\n")
    return exp


def test_completion_gate_runs_and_reports(completion_exp_dir, monkeypatch,
                                          capsys):
    """--completion drives the CONDITIONAL int8 sampler
    (ldt_tpu/serving/int8.py::denoise_cond_int8) through the gate: both
    modes sample, CD x 1000 + F1 reported, verdict emitted."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    monkeypatch.setenv("LDT_SERVE_INT8", "0")
    import scripts.int8_golden_gate as gate

    monkeypatch.setattr(sys, "argv",
                        ["gate", "--exp", str(completion_exp_dir),
                         "--completion", "--num", "2", "--threshold", "1.0"])
    rc = gate.main()
    out = capsys.readouterr().out
    assert "checkpt_3.msgpack" in out
    assert "cd_x1000" in out and "f1score" in out
    assert "paired CD" in out
    assert rc in (0, 1)  # random-init numerics may exceed the threshold
    assert ("PASSED" in out) or ("FAILED" in out)


class TestGateStamp:
    """Sample-time enforcement of the golden-gate stamps (VERDICT r4 #5):
    serving/int8.py::verify_gate_stamp must warn on a missing/failed/
    mismatched stamp, refuse under LDT_SERVE_INT8_STRICT=1, and stay quiet
    when a matching PASSED stamp exists."""

    def _cfg(self):
        return dict2namespace(dict(sde=dict(
            sample_N=1000, predictor="ancestral", sample_mode="discrete",
            sde_type="vpsde")))

    def _ckpt(self, tmp_path):
        p = tmp_path / "checkpt_9.msgpack"
        p.write_bytes(b"fake-checkpoint-bytes" * 100)
        return str(p)

    def test_missing_stamp_warns_and_strict_raises(self, tmp_path,
                                                   monkeypatch, capsys):
        from ldt_tpu.serving.int8 import verify_gate_stamp

        ckpt = self._ckpt(tmp_path)
        monkeypatch.delenv("LDT_SERVE_INT8_STRICT", raising=False)
        assert verify_gate_stamp(ckpt, self._cfg(), False) is not None
        assert "WARNING" in capsys.readouterr().out
        monkeypatch.setenv("LDT_SERVE_INT8_STRICT", "1")
        with pytest.raises(RuntimeError, match="int8-gate"):
            verify_gate_stamp(ckpt, self._cfg(), False)

    def test_passed_stamp_is_quiet(self, tmp_path, capsys):
        from ldt_tpu.serving.int8 import verify_gate_stamp, write_gate_stamp

        ckpt = self._ckpt(tmp_path)
        write_gate_stamp(ckpt, self._cfg(), False, passed=True,
                         results={}, threshold=0.01)
        assert verify_gate_stamp(ckpt, self._cfg(), False) is None
        assert "WARNING" not in capsys.readouterr().out

    def test_failed_and_mismatched_and_tampered(self, tmp_path, capsys):
        from ldt_tpu.serving.int8 import verify_gate_stamp, write_gate_stamp

        ckpt = self._ckpt(tmp_path)
        write_gate_stamp(ckpt, self._cfg(), False, passed=False,
                         results={}, threshold=0.01)
        assert "FAILED" in verify_gate_stamp(ckpt, self._cfg(), False)

        write_gate_stamp(ckpt, self._cfg(), False, passed=True,
                         results={}, threshold=0.01)
        # certified 1000-step ancestral; serving DDIM-50 must not match
        other = self._cfg()
        other.sde.sample_N, other.sde.predictor = 50, "ddim"
        assert "different sampler" in verify_gate_stamp(ckpt, other, False)
        # completion flag is part of the signature too
        assert "different sampler" in verify_gate_stamp(ckpt, self._cfg(),
                                                        True)
        # tampered checkpoint content invalidates the stamp
        with open(ckpt, "ab") as f:
            f.write(b"x")
        assert "changed since" in verify_gate_stamp(ckpt, self._cfg(), False)

    def test_quant_scheme_knobs_in_signature(self, tmp_path, monkeypatch):
        """A plain-W8A8 pass must not certify the int8-attention-core or
        bf16-tail schemes (round-4: both changed gate outcomes)."""
        from ldt_tpu.serving.int8 import verify_gate_stamp, write_gate_stamp

        ckpt = self._ckpt(tmp_path)
        monkeypatch.delenv("LDT_ATTN_INT8", raising=False)
        monkeypatch.delenv("LDT_INT8_BF16_TAIL", raising=False)
        write_gate_stamp(ckpt, self._cfg(), False, passed=True,
                         results={}, threshold=0.01)
        assert verify_gate_stamp(ckpt, self._cfg(), False) is None
        monkeypatch.setenv("LDT_ATTN_INT8", "1")
        assert "different sampler" in verify_gate_stamp(ckpt, self._cfg(),
                                                        False)
        monkeypatch.delenv("LDT_ATTN_INT8", raising=False)
        monkeypatch.setenv("LDT_INT8_BF16_TAIL", "4")
        assert "different sampler" in verify_gate_stamp(ckpt, self._cfg(),
                                                        False)
        # static-activation-scale scheme is part of the signature too
        monkeypatch.delenv("LDT_INT8_BF16_TAIL", raising=False)
        monkeypatch.setenv("LDT_INT8_STATIC", "1")
        assert "different sampler" in verify_gate_stamp(ckpt, self._cfg(),
                                                        False)
        # ...but NOT for the conditional sampler, which has no static path
        # (the env knob must not fork its certification)
        monkeypatch.delenv("LDT_INT8_STATIC", raising=False)
        ckpt2 = str(tmp_path / "checkpt_c.msgpack")
        open(ckpt2, "wb").write(b"completion-ckpt" * 50)
        write_gate_stamp(ckpt2, self._cfg(), True, passed=True,
                         results={}, threshold=0.01)
        monkeypatch.setenv("LDT_INT8_STATIC", "1")
        assert verify_gate_stamp(ckpt2, self._cfg(), True) is None

    def test_second_config_stamp_preserves_first(self, tmp_path):
        """Certification is per-(checkpoint, sampler-config): gating a
        second config (e.g. DDIM-50, the round-4 documented FAIL) must not
        destroy the first config's PASSED entry (round-5 review finding)."""
        from ldt_tpu.serving.int8 import verify_gate_stamp, write_gate_stamp

        ckpt = self._ckpt(tmp_path)
        write_gate_stamp(ckpt, self._cfg(), False, passed=True,
                         results={}, threshold=0.01)
        ddim = self._cfg()
        ddim.sde.sample_N, ddim.sde.predictor = 50, "ddim"
        write_gate_stamp(ckpt, ddim, False, passed=False,
                         results={}, threshold=0.01)
        # the ancestral certification survives; DDIM reports its own FAIL
        assert verify_gate_stamp(ckpt, self._cfg(), False) is None
        assert "FAILED" in verify_gate_stamp(ckpt, ddim, False)
        # re-gating the same config replaces its entry, not appends
        write_gate_stamp(ckpt, ddim, False, passed=True,
                         results={}, threshold=0.01)
        assert verify_gate_stamp(ckpt, ddim, False) is None

    def test_corrupt_stamp_warns_not_crashes(self, tmp_path, capsys):
        """A truncated stamp (killed gate / container reset mid-write) must
        produce the warn/refuse path, not an uncaught JSONDecodeError."""
        from ldt_tpu.serving.int8 import (gate_stamp_path,
                                          verify_gate_stamp)

        ckpt = self._ckpt(tmp_path)
        with open(gate_stamp_path(ckpt), "w") as f:
            f.write('{"entries": [{"passed": tru')  # truncated mid-write
        problem = verify_gate_stamp(ckpt, self._cfg(), False)
        assert problem is not None and "unreadable" in problem
        assert "WARNING" in capsys.readouterr().out

    def test_fingerprint_covers_interior_of_medium_files(self, tmp_path):
        """Checkpoints between 4 and 8 MB: every byte must be covered by
        the head+tail hash (a `size > 2*chunk` guard left the middle of
        such files unhashed — round-5 review finding)."""
        from ldt_tpu.serving.int8 import _ckpt_fingerprint

        p = tmp_path / "mid.msgpack"
        data = bytearray(6 * 1024 * 1024)
        p.write_bytes(data)
        before = _ckpt_fingerprint(str(p))
        data[5 * 1024 * 1024] = 0xFF  # flip one interior byte, same size
        p.write_bytes(data)
        after = _ckpt_fingerprint(str(p))
        assert before["size"] == after["size"]
        assert before["sha256_edges"] != after["sha256_edges"]

    def test_trainer_sample_checks_once(self, tmp_path, monkeypatch,
                                        capsys):
        """The stage-2 trainer consults the stamp on its first int8-serving
        sample and caches the verdict."""
        import jax

        from ldt_tpu.models import Compressor, Score
        from ldt_tpu.training.latent_sde_trainer import Trainer

        cfg = _tiny_trainer_cfg(tmp_path)
        tr = Trainer(cfg, Score(cfg.score), Compressor(cfg.compressor),
                     rng=jax.random.key(0))
        batch = {"tr_points": np.random.RandomState(0).randn(
            2, N_PTS, 3).astype(np.float32)}
        tr.maybe_init(batch)
        monkeypatch.setenv("LDT_SERVE_INT8", "1")
        calls = []
        import ldt_tpu.serving.int8 as int8_mod

        monkeypatch.setattr(
            int8_mod, "verify_gate_stamp",
            lambda *a, **k: calls.append(a) or None)
        tr.sample(2, N_PTS)
        tr.sample(2, N_PTS)
        assert len(calls) == 1, "stamp must be checked once per checkpoint"
        # no restore happened -> unknown-origin path (ckpt_path None)
        assert calls[0][0] is None


def _tiny_trainer_cfg(tmp_path):
    from ldt_tpu.tools.io import dict2namespace as d2n

    model = dict(
        outsize=N_PTS, max_outputs=N_PTS, input_dim=3, z_dim=4, z_scales=8,
        p_dim=16, n_layers=2, hidden_dim=32, num_heads=2, activation="swish",
        encoder_dropout_p=0.0, decoder_dropout_p=0.0, norm="layer_norm",
        neighbors=8, encoder_layers=1, mlp_ratio=2.0, min_sigma=-30,
        cluster_norm="anchor", norm_input=False, pre_group=False,
        decoder_act=None, ActNorm=True, AdaLN=True, pos_embedding="center",
        class_condition=False, num_categorys=1, pretrain_path=None)
    exp = tmp_path / "exp_stamp"
    exp.mkdir(exist_ok=True)
    return d2n(dict(
        data=dict(cates=["airplane"], num_categorys=1,
                  tr_max_sample_points=N_PTS, te_max_sample_points=N_PTS,
                  batch_size=2, test_batch_size=2, boundary=True,
                  num_workers=0),
        opt=dict(adj_lr="warm_up", warmup_iters=2, lr=1e-3, beta1=0.9,
                 beta2=0.999, ema_decay=0.99, weight_decay=0.0,
                 grad_norm_clip_value=1.0, kl_weight=1e-6, loss_type="l2",
                 discrete=True),
        log=dict(save_epoch_freq=1, save_path=str(exp), log_epoch_freq=1,
                 eval_epoch_freq=1000,
                 traincolumns=["epoch", "itr", "loss", "time"],
                 trainformat=[None, None, "{:.4f}", "{:.0f}"],
                 evalcolumns=["epoch", "mmd-CD"],
                 evalformat=[None, "{:.8f}"]),
        common=dict(epochs=2, num_points=N_PTS, seed=0),
        model=model, compressor=model,
        score=dict(num_steps=8, z_dim=8, z_scale=8, hidden_size=32,
                   num_heads=4, num_blocks=2, num_categorys=1, t_dim=16,
                   dropout=0.0, norm="layer_norm", learn_sigma=False,
                   act="swish", unet=False, AdaLN=True, condition=False),
        sde=dict(beta_start=0.1, beta_end=20.0, sde_type="vpsde",
                 sigma2_0=0.0, iw_sample_p_mode="drop_all_iw",
                 iw_sample_q_mode="drop_all_iw", time_eps=0.01, ode_tol=1e-4,
                 sample_time_eps=1e-6, sample_mode="discrete",
                 predictor="ancestral", corrector=None, train_N=8,
                 sample_N=8, snr=0.01, corrector_steps=1, denoise=True,
                 probability_flow=False, alpha=1.0),
    ))
