"""Torch-checkpoint import: reference state_dicts -> this repo's param trees.

The reference (Negai-98/LDT) saves `torch.save` dicts with `state_dict`
(Compressor checkpoints, trainer/base.py:51-61) or `score_state_dict` +
`compressor_state_dict` (stage-2/3 dual checkpoints,
trainer/Latent_SDE_Trainer.py:228-239). This module converts those
state_dicts into this repo's flax variable trees so that released reference
weights (or any torch training run) can be evaluated / finetuned here the
day they land:

  * `port_compressor(sd)` / `port_score(sd)` -> {'params', 'batch_stats'}
  * `port_checkpoint(path, out)` CLI: whole-file conversion into this
    repo's msgpack checkpoint format (weights + EMA; optimizer moments are
    NOT ported - resume converted checkpoints with `--strict False`).

Weight-layout conversions handled:
  * Conv1d(k=1) [out, in, 1]  -> Dense kernel [in, out]
  * Linear [out, in]          -> Dense kernel [in, out]
  * Conv2d [out, in, kh, kw]  -> flax Conv [kh, kw, in, out]
  * BatchNorm weight/bias     -> scale/bias + running stats -> batch_stats
  * LayerNorm weight/bias     -> scale/bias
  * Embedding weight          -> Embed embedding
  * buffers (`initialized`, `num_batches_tracked`) -> dropped
  * ConditionNet's dead `conv_out` (score.py:29, created but never called)
    -> dropped

IMPORTANT - head-merge compatibility: the reference merges attention heads
with `(w @ v).reshape(B, N, C)` on a [B, H, N, dh] tensor
(model/layers.py:197) - a token/channel scramble that cannot be folded into
fc_o. Weights trained under it only reproduce their outputs when run with
the same merge: construct the nets with `ref_merge=True`
(`Score(cfg, ref_merge=True)` / `Compressor(cfg, ref_merge=True)`) when
using ported checkpoints. For finetuning under the standard merge, load the
same tree into default nets and expect a brief re-adaptation of fc_o.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional, Tuple

import numpy as np

# --------------------------------------------------------------------------
# leaf transforms
# --------------------------------------------------------------------------


def _np(v) -> np.ndarray:
    if hasattr(v, "detach"):  # torch tensor without importing torch
        v = v.detach().cpu().numpy()
    return np.asarray(v)


def _conv1(name: str, v: np.ndarray):
    if name == "weight":
        return "kernel", _np(v)[:, :, 0].T
    return name, _np(v)


def _linear(name: str, v: np.ndarray):
    if name == "weight":
        return "kernel", _np(v).T
    return name, _np(v)


def _conv2d(name: str, v: np.ndarray):
    if name == "weight":
        return "kernel", _np(v).transpose(2, 3, 1, 0)
    return name, _np(v)


def _layernorm(name: str, v: np.ndarray):
    return ("scale" if name == "weight" else name), _np(v)


def _embed(name: str, v: np.ndarray):
    return ("embedding" if name == "weight" else name), _np(v)


def _direct(name: str, v: np.ndarray):
    return name, _np(v)


_KINDS = {"conv1": _conv1, "linear": _linear, "conv2d": _conv2d,
          "layernorm": _layernorm, "embed": _embed, "direct": _direct}

# BatchNorm splits across collections:
_BN_PARAMS = {"weight": "scale", "bias": "bias"}
_BN_STATS = {"running_mean": "mean", "running_var": "var"}

_DROP_LEAVES = {"num_batches_tracked", "initialized"}

# --------------------------------------------------------------------------
# module-path rules
# --------------------------------------------------------------------------

# Inner rules for a reference ResidualBlock (model/layers.py:140-229).
_BLOCK_INNER = [
    (r"^(fc_q|fc_kv|fc_o)$", r"attn/\1", "conv1"),
    (r"^adaLN\.1$", "adaLN", "linear"),
    (r"^adaLN1\.1$", "adaLN1", "linear"),
    (r"^adaLN2\.1$", "adaLN2", "linear"),
    (r"^pos_embedding\.1$", "pos_embedding", "linear"),
    (r"^norm1\.norm$", "LayerNorm_0", "layernorm"),
    (r"^norm2\.norm$", "LayerNorm_1", "layernorm"),
    (r"^mlp\.fc\.0\.0$", "mlp/Dense_0", "conv1"),
    (r"^mlp\.out$", "mlp/Dense_1", "conv1"),
    (r"^shortcut$", "shortcut", "conv1"),
]

# FinalLayer (model/layers.py:232-248)
_FINAL_INNER = [
    (r"^adaLN\.1$", "adaLN", "linear"),
    (r"^ln$", "ln", "conv1"),
]

# TimeEmbedding / LabelEmbedding (model/layers.py:14-52)
_TIME_INNER = [
    (r"^mlp\.0$", "Dense_0", "linear"),
    (r"^mlp\.2$", "Dense_1", "linear"),
]
_LABEL_INNER = [
    (r"^label_emb$", "Embed_0", "embed"),
    (r"^mlp\.0$", "Dense_0", "linear"),
    (r"^mlp\.2$", "Dense_1", "linear"),
]

# LocalGrouper (+ its PreExtraction / ConvBNReLURes1D stack,
# model/Compressor/layers.py:115-187,271-319)
_GROUPER_INNER = [
    (r"^(affine_alpha|affine_beta)$", r"\1", "direct"),
    (r"^extraction\.transfer\.net\.0$", "extraction/transfer_dense", "conv1"),
    (r"^extraction\.transfer\.net\.1$", "extraction/transfer_bn", "bn"),
    (r"^extraction\.operation\.(\d+)\.net1\.0$",
     r"extraction/op\1/net1_dense", "conv1"),
    (r"^extraction\.operation\.(\d+)\.net1\.1$",
     r"extraction/op\1/net1_bn", "bn"),
    (r"^extraction\.operation\.(\d+)\.net2\.0$",
     r"extraction/op\1/net2_dense", "conv1"),
    (r"^extraction\.operation\.(\d+)\.net2\.1$",
     r"extraction/op\1/net2_bn", "bn"),
]

# MiniPointnet (model/Compressor/Network.py:86-101)
_MINIPOINTNET_INNER = [
    (r"^conv1$", "conv1", "conv1"),
    (r"^conv2$", "conv2", "conv1"),
    (r"^bn1$", "bn1", "bn"),
    (r"^bn2$", "bn2", "bn"),
    (r"^fc$", "fc", "linear"),
]

# torchvision resnet18 BasicBlock -> models/score.py::BasicBlock
_RESNET_BASIC_INNER = [
    (r"^conv1$", "Conv_0", "conv2d"),
    (r"^bn1$", "BatchNorm_0", "bn"),
    (r"^conv2$", "Conv_1", "conv2d"),
    (r"^bn2$", "BatchNorm_1", "bn"),
    (r"^downsample\.0$", "downsample_conv", "conv2d"),
    (r"^downsample\.1$", "downsample_bn", "bn"),
]


def _prefix(rules, pat, repl):
    """Scope `rules` under a reference prefix regex + our prefix template.

    Backreferences inside the inner rule's template are renumbered past the
    prefix pattern's capture groups (e.g. `attn/\\1` under a one-group
    prefix becomes `attn/\\2`).
    """
    shift = re.compile(pat).groups
    out = []
    for r, t, k in rules:
        t_shifted = re.sub(r"\\(\d+)",
                           lambda m: "\\" + str(int(m.group(1)) + shift), t)
        out.append((pat + r"\." + r.lstrip("^"), repl + "/" + t_shifted, k))
    return out


def _condition_net_rules(prefix_pat: str, prefix_repl: str):
    rules = [
        (prefix_pat + r"\.pc_conv_in$", prefix_repl + "/pc_conv_in", "conv1"),
        (prefix_pat + r"\.pc_conv_out$", prefix_repl + "/pc_conv_out",
         "conv1"),
        (prefix_pat + r"\.ln$", prefix_repl + "/ln", "linear"),
        # dead layer: created but never called (score.py:29)
        (prefix_pat + r"\.conv_out$", None, "drop"),
        (prefix_pat + r"\.resnet\.0$", prefix_repl + "/resnet/conv1",
         "conv2d"),
        (prefix_pat + r"\.resnet\.1$", prefix_repl + "/resnet/bn1", "bn"),
    ]
    for seq_idx, layer in ((4, "layer1"), (5, "layer2")):
        rules += _prefix(
            _RESNET_BASIC_INNER,
            prefix_pat + r"\.resnet\.%d\.(\d+)" % seq_idx,
            prefix_repl + "/resnet/" + layer + r"_\1")
    rules += _prefix(_GROUPER_INNER, prefix_pat + r"\.group",
                     prefix_repl + "/group")
    return rules


COMPRESSOR_RULES = (
    [
        (r"^input$", "input_dense", "conv1"),
        (r"^output$", "output_dense", "conv1"),
        (r"^conv_in$", "conv_in", "direct"),  # ActNorm shift/log_scale
        (r"^decoder\.(\d+)\.prior\.1$", r"decoder_\1/prior_dense", "conv1"),
        (r"^decoder\.(\d+)\.ln$", r"decoder_\1/ln", "conv1"),
        (r"^init_set\.(\w+)$", r"init_set/\1", "direct"),
    ]
    + _prefix(_BLOCK_INNER, r"^encoder\.(\d+)\.atts\.(\d+)",
              r"encoder_\1/att\2")
    + _prefix(_FINAL_INNER, r"^encoder\.(\d+)\.conv_out",
              r"encoder_\1/conv_out")
    + _prefix(_BLOCK_INNER, r"^decoder\.(\d+)\.(att1?)", r"decoder_\1/\2")
    + _prefix(_GROUPER_INNER, r"^group", "group")
    + _prefix(_GROUPER_INNER, r"^pre_grouper", "pre_grouper")
    + _prefix(_MINIPOINTNET_INNER, r"^pos_embedding", "pos_embedding")
    + _prefix(_LABEL_INNER, r"^LabelEmbedding", "label_embedding")
)

SCORE_RULES = (
    [
        (r"^ln_in$", "ln_in", "conv1"),
    ]
    + _prefix(_BLOCK_INNER, r"^Transformer\.(\d+)", r"transformer_\1")
    + _prefix(_BLOCK_INNER, r"^Transformer_Up\.(\d+)", r"transformer_up_\1")
    + _prefix(_BLOCK_INNER, r"^Transformer_Mid", "transformer_mid")
    + _prefix(_BLOCK_INNER, r"^Transformer_Down\.(\d+)",
              r"transformer_down_\1")
    + _prefix(_FINAL_INNER, r"^ln_out", "ln_out")
    + _prefix(_TIME_INNER, r"^TimeEmbedding", "time_embedding")
    + _prefix(_LABEL_INNER, r"^LabelEmbedding", "label_embedding")
    + _condition_net_rules(r"^c_net", "c_net")
)

# --------------------------------------------------------------------------
# engine
# --------------------------------------------------------------------------


def _insert(tree: Dict[str, Any], path: str, leaf_name: str, value):
    node = tree
    for part in path.split("/"):
        node = node.setdefault(part, {})
    node[leaf_name] = value


def _port(sd: Dict[str, Any], rules) -> Dict[str, Any]:
    params: Dict[str, Any] = {}
    batch_stats: Dict[str, Any] = {}
    unmatched = []
    for key, value in sd.items():
        module, _, leaf = key.rpartition(".")
        if not module:  # top-level parameter (e.g. init_set-less prior)
            module, leaf = key, ""
        if leaf in _DROP_LEAVES:
            continue
        matched = False
        for pat, repl, kind in rules:
            m = re.match(pat + "$", module)
            if m is None:
                # direct params like `group.affine_alpha` carry no leaf
                # suffix: try the whole key as the module path
                m = re.match(pat + "$", key)
                if m is None:
                    continue
                module_key, leaf_key = key, None
            else:
                module_key, leaf_key = module, leaf
            if kind == "drop":
                matched = True
                break
            target = m.expand(repl)
            if leaf_key is None:
                # whole-key match: target path names the leaf itself
                path, _, name = target.rpartition("/")
                _insert(params, path, name, _np(value))
            elif kind == "bn":
                if leaf_key in _BN_PARAMS:
                    _insert(params, target, _BN_PARAMS[leaf_key], _np(value))
                elif leaf_key in _BN_STATS:
                    _insert(batch_stats, target, _BN_STATS[leaf_key],
                            _np(value))
                else:
                    raise ValueError(f"unknown BN leaf: {key}")
            else:
                name, v = _KINDS[kind](leaf_key, value)
                _insert(params, target, name, v)
            matched = True
            break
        if not matched:
            unmatched.append(key)
    if unmatched:
        raise ValueError(
            "unmapped reference keys (extend the rule table): "
            + ", ".join(unmatched[:10])
            + (f" ... (+{len(unmatched) - 10})" if len(unmatched) > 10
               else ""))
    out = {"params": params}
    if batch_stats:
        out["batch_stats"] = batch_stats
    return out


def port_compressor(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Reference Compressor state_dict -> {'params', 'batch_stats'}."""
    return _port(state_dict, COMPRESSOR_RULES)


def port_score(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Reference Score state_dict -> {'params'[, 'batch_stats']}."""
    return _port(state_dict, SCORE_RULES)


def port_ema(state_dict: Dict[str, Any], optim_state: Dict[str, Any],
             rules=None) -> Optional[Dict[str, Any]]:
    """Extract the EMA shadow params from a reference EMA(Adam) state.

    The reference keeps EMA shadows inside optimizer state under the 'ema'
    key (tools/utils.py:49-50), indexed by parameter ORDER: the i-th entry
    of optim_state['state'] corresponds to the i-th *parameter* (buffers
    excluded) of the state_dict. Returns an EMA param tree shaped like
    `port_*`'s ['params'], or None if no shadows are stored.
    """
    rules = SCORE_RULES if rules is None else rules
    opt = optim_state.get("state", {})
    if not opt or "ema" not in next(iter(opt.values()), {}):
        return None
    param_keys = [k for k in state_dict
                  if k.rsplit(".", 1)[-1] not in _DROP_LEAVES
                  and "running_mean" not in k and "running_var" not in k]
    ema_sd = {}
    for i, key in enumerate(param_keys):
        entry = opt.get(i)
        if entry is None or "ema" not in entry:
            return None
        ema_sd[key] = entry["ema"]
    return _port(ema_sd, rules)["params"]


# --------------------------------------------------------------------------
# whole-checkpoint CLI
# --------------------------------------------------------------------------


def port_checkpoint(path: str, out: Optional[str] = None,
                    with_ema: bool = True) -> Dict[str, Any]:
    """Convert a reference `.pth` checkpoint into this repo's format.

    Single-net checkpoints ('state_dict', trainer/base.py:51-61) become
    `{'state': {'params', 'batch_stats'}}` - directly consumable by
    stage-2 `load_pretrain`. Dual checkpoints
    ('score_state_dict' + 'compressor_state_dict',
    trainer/Latent_SDE_Trainer.py:228-239) become
    `{'score': {'params'[, 'ema']}, 'compressor': {...}}` - resume with
    `--strict False` (optimizer moments are not ported).
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if "score_state_dict" in ckpt:
        score = port_score(ckpt["score_state_dict"])
        if with_ema and "score_optim_state_dict" in ckpt:
            ema = port_ema(ckpt["score_state_dict"],
                           ckpt["score_optim_state_dict"])
            if ema is not None:
                score["ema"] = ema
        tree = {"score": score,
                "compressor": port_compressor(ckpt["compressor_state_dict"])}
    elif "state_dict" in ckpt:
        tree = {"state": port_compressor(ckpt["state_dict"])}
    else:
        raise ValueError(f"unrecognized reference checkpoint keys: "
                         f"{sorted(ckpt.keys())}")
    if out is not None:
        from ldt_tpu.training.checkpoint import save_checkpoint

        save_checkpoint(out, tree, cfg=None,
                        epoch=int(ckpt.get("epoch", 0)),
                        itr=int(ckpt.get("itr", 0)),
                        time=float(ckpt.get("time", 0.0)))
    return tree


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(
        description="Port a reference (Negai-98/LDT) torch checkpoint to "
                    "the LDT-TPU msgpack format")
    p.add_argument("checkpoint", help="path to the reference .pth file")
    p.add_argument("--out", required=True, help="output .msgpack path")
    p.add_argument("--no-ema", action="store_true",
                   help="skip porting EMA shadow params")
    args = p.parse_args(argv)
    tree = port_checkpoint(args.checkpoint, args.out,
                           with_ema=not args.no_ema)
    print(f"ported: {sorted(tree.keys())} -> {args.out}")
    print("NOTE: run ported nets with ref_merge=True for exact output "
          "parity; resume with --strict False (no optimizer moments).")


if __name__ == "__main__":
    main()
