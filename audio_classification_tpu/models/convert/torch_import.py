"""torch checkpoint -> JAX pytree converters.

The reference loads asteroid Conv-TasNet weights from local/HF torch
checkpoints (reference: separation.py:105-163, `torch.load` + state_dict
unwrap :53-56). This module maps asteroid's parameter naming onto our
ConvTasNet module tree. Runs on CPU torch (baked into the image); no
network access is assumed — checkpoints must be local files.
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np

from ..convtasnet import ConvTasNet, ConvTasNetConfig


def _load_state_dict(path: str) -> Dict[str, Any]:
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict):
        for key in ("state_dict", "model_state_dict", "model"):
            if key in ckpt and isinstance(ckpt[key], dict):
                ckpt = ckpt[key]
                break
    return {k: np.asarray(v.detach().cpu().numpy()) for k, v in ckpt.items() if hasattr(v, "detach")}


def load_convtasnet_torch(path: str, cfg: ConvTasNetConfig):
    """Map an asteroid ConvTasNet state_dict onto our parameter tree.

    asteroid names: encoder.filterbank._filters [N,1,L]; decoder.filterbank.
    _filters [N,1,L]; masker.bottleneck.{0,1}; masker.TCN.{i}.shared_block...
    Naming drifts across asteroid versions, so matching is by shape+role
    with explicit failures rather than silent skips.
    """
    sd = _load_state_dict(path)
    import jax
    import jax.numpy as jnp

    model = ConvTasNet(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8000)), jnp.ones((1, 8000)))
    p = jax.tree.map(np.asarray, params)["params"]

    def want(name: str) -> np.ndarray:
        for k in sd:
            if k.endswith(name) or name in k:
                return sd[k]
        raise KeyError(f"torch checkpoint missing tensor matching '{name}'")

    # encoder filters: torch [N, 1, L] conv weight -> ours [L, 1, N]
    enc = want("encoder.filterbank._filters")
    p["encoder"]["kernel"] = enc.transpose(2, 1, 0).astype(np.float32)
    dec = want("decoder.filterbank._filters")
    # decoder basis [N,1,L] -> [L, N]
    p["decoder"] = dec[:, 0, :].T.astype(np.float32)

    # bottleneck: norm + 1x1 conv
    p["ln_in"]["gamma"] = want("masker.bottleneck.0.gamma").reshape(-1)
    p["ln_in"]["beta"] = want("masker.bottleneck.0.beta").reshape(-1)
    bk = want("masker.bottleneck.1.weight")  # [B, N, 1]
    p["bottleneck"]["kernel"] = bk.transpose(2, 1, 0).astype(np.float32)
    p["bottleneck"]["bias"] = want("masker.bottleneck.1.bias").astype(np.float32)

    def conv_block(prefix: str, dst: Dict[str, Any]):
        w_in = sd[f"{prefix}.shared_block.0.weight"]  # [H, B, 1]
        dst["in_conv"]["kernel"] = w_in.transpose(2, 1, 0).astype(np.float32)
        dst["in_conv"]["bias"] = sd[f"{prefix}.shared_block.0.bias"].astype(np.float32)
        dst["prelu1"]["alpha"] = sd[f"{prefix}.shared_block.1.weight"].reshape(1).astype(np.float32)
        dst["norm1"]["gamma"] = sd[f"{prefix}.shared_block.2.gamma"].reshape(-1)
        dst["norm1"]["beta"] = sd[f"{prefix}.shared_block.2.beta"].reshape(-1)
        w_dw = sd[f"{prefix}.shared_block.3.weight"]  # [H, 1, P]
        dst["dw_conv"]["kernel"] = w_dw.transpose(2, 1, 0).astype(np.float32)
        dst["dw_conv"]["bias"] = sd[f"{prefix}.shared_block.3.bias"].astype(np.float32)
        dst["prelu2"]["alpha"] = sd[f"{prefix}.shared_block.4.weight"].reshape(1).astype(np.float32)
        dst["norm2"]["gamma"] = sd[f"{prefix}.shared_block.5.gamma"].reshape(-1)
        dst["norm2"]["beta"] = sd[f"{prefix}.shared_block.5.beta"].reshape(-1)
        w_res = sd[f"{prefix}.res_conv.weight"]
        dst["res_conv"]["kernel"] = w_res.transpose(2, 1, 0).astype(np.float32)
        dst["res_conv"]["bias"] = sd[f"{prefix}.res_conv.bias"].astype(np.float32)
        w_skip = sd[f"{prefix}.skip_conv.weight"]
        dst["skip_conv"]["kernel"] = w_skip.transpose(2, 1, 0).astype(np.float32)
        dst["skip_conv"]["bias"] = sd[f"{prefix}.skip_conv.bias"].astype(np.float32)

    for r in range(cfg.n_repeats):
        for x in range(cfg.n_blocks):
            i = r * cfg.n_blocks + x
            conv_block(f"masker.TCN.{i}", p[f"tcn_{r}_{x}"])

    p["mask_prelu"]["alpha"] = want("masker.mask_net.0.weight").reshape(1).astype(np.float32)
    mw = want("masker.mask_net.1.weight")  # [S*N, B, 1]
    p["mask_conv"]["kernel"] = mw.transpose(2, 1, 0).astype(np.float32)
    p["mask_conv"]["bias"] = want("masker.mask_net.1.bias").astype(np.float32)

    return {"params": jax.tree.map(jnp.asarray, p)}


class MossFormerImportError(RuntimeError):
    """Structured MossFormer import failure: lists every unmatched role and
    every leftover checkpoint tensor so naming drift is diagnosable."""

    def __init__(self, missing, shape_errors, unused):
        self.missing = list(missing)
        self.shape_errors = list(shape_errors)
        self.unused = list(unused)
        lines = ["MossFormer torch checkpoint does not map onto this architecture."]
        if missing:
            lines.append("  roles with no matching tensor:")
            lines += [f"    - {m}" for m in missing]
        if shape_errors:
            lines.append("  shape mismatches (role: got vs want):")
            lines += [f"    - {e}" for e in shape_errors]
        if unused:
            lines.append(f"  checkpoint tensors left unmatched ({len(unused)}):")
            lines += [f"    - {k}" for k in unused[:20]]
            if len(unused) > 20:
                lines.append(f"    ... and {len(unused) - 20} more")
        lines.append(
            "  The ModelScope `speech_mossformer_separation_temporal_8k` "
            "distribution's exact naming is unverifiable offline "
            "(reference: src/mossformer/infer.py:13-23); this importer keys "
            "on the published ClearVoice/ModelScope module naming. If your "
            "checkpoint drifts, re-export to ONNX or rename per the roles above.")
        super().__init__("\n".join(lines))


def load_mossformer_torch(path: str, cfg: "MossFormerConfig" = None):
    """Best-effort ModelScope/ClearVoice MossFormer state_dict -> JAX params.

    The reference's second separation backend ships as a torch checkpoint on
    ModelScope (`iic/speech_mossformer_separation_temporal_8k`, loaded by the
    ModelScope pipeline — reference: src/mossformer/infer.py:13-23). The
    published implementation is a conv encoder/decoder around FLASH-style
    gated-attention (GAU) blocks; this maps its tensors onto
    ``models/mossformer.MossFormer`` by ROLE, accepting the naming variants
    seen in ClearVoice/ModelScope (``mask_net.mdl.mossformerM.layers.{i}``)
    and this framework's canonical mirror naming (``mask_net.layers.{i}``).
    Any unmatched role, leftover tensor, or shape mismatch raises
    :class:`MossFormerImportError` listing everything at once.
    """
    from ..mossformer import MossFormer, MossFormerConfig

    import jax
    import jax.numpy as jnp

    cfg = cfg or MossFormerConfig()
    sd = _load_state_dict(path)
    # strip common wrappers
    for pre in ("model.", "module.", "separator."):
        if all(k.startswith(pre) for k in sd):
            sd = {k[len(pre):]: v for k, v in sd.items()}

    model = MossFormer(cfg)
    t0 = max(cfg.enc_kernel * 4, 64)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, t0)), jnp.ones((1, t0)))
    p = jax.tree.map(np.asarray, params)["params"]

    matched = set()
    missing, shape_errors = [], []

    def find(cands):
        """First sd tensor whose key equals/ends with any candidate suffix."""
        for c in cands:
            for k in sd:
                if k == c or k.endswith("." + c) or k.endswith(c):
                    matched.add(k)
                    return k, sd[k]
        return None, None

    def take(role, cands, want_shape, transform):
        k, v = find(cands)
        if v is None:
            missing.append(f"{role} (tried: {', '.join(cands)})")
            return None
        try:
            out = transform(v)
        except Exception as e:  # transpose/reshape of a wrong-rank tensor
            shape_errors.append(f"{role}: {k} has shape {tuple(v.shape)} ({e})")
            return None
        if tuple(out.shape) != tuple(want_shape):
            shape_errors.append(
                f"{role}: {k} -> {tuple(out.shape)} vs want {tuple(want_shape)}")
            return None
        return out.astype(np.float32)

    def lin_w(v):
        """torch Linear [out,in] or 1x1 Conv1d [out,in,1] -> flax [in,out]."""
        if v.ndim == 3 and v.shape[-1] == 1:
            v = v[..., 0]
        return v.T

    def put(dst, key, val):
        if val is not None:
            dst[key] = val

    c = cfg
    d_e = c.dim * c.expansion
    # conv encoder: torch [enc_dim, 1, K] -> flax [K, 1, enc_dim]
    put(p["encoder"], "kernel",
        take("encoder", ["encoder.conv1d.weight", "encoder.weight"],
             p["encoder"]["kernel"].shape, lambda v: v.transpose(2, 1, 0)))
    put(p["in_proj"], "kernel",
        take("in_proj.weight",
             ["mask_net.conv1d_encoder.weight", "mask_net.bottleneck.weight",
              "in_proj.weight"], (c.enc_dim, c.dim), lin_w))
    put(p["in_proj"], "bias",
        take("in_proj.bias",
             ["mask_net.conv1d_encoder.bias", "mask_net.bottleneck.bias",
              "in_proj.bias"], (c.dim,), lambda v: v.reshape(-1)))

    for i in range(c.layers):
        g = p[f"gau_{i}"]
        stems = [f"mask_net.mdl.mossformerM.layers.{i}",
                 f"mask_net.mdl.layers.{i}", f"mask_net.layers.{i}",
                 f"layers.{i}"]

        def blk(names, want, tf, _stems=stems, _i=i):
            cands = [f"{s}.{n}" for n in names for s in _stems]
            return take(f"layer{_i}.{names[0]}", cands, want, tf)

        put(g["ln"], "gamma", blk(["norm.weight", "ln.weight", "norm.gamma"],
                                  (c.dim,), lambda v: v.reshape(-1)))
        put(g["ln"], "beta", blk(["norm.bias", "ln.bias", "norm.beta"],
                                 (c.dim,), lambda v: v.reshape(-1)))
        # depthwise conv: torch [dim, 1, K] -> flax [K, 1, dim]
        put(g["dwconv"], "kernel", blk(["conv.weight", "dwconv.weight"],
                                       (c.conv_kernel, 1, c.dim),
                                       lambda v: v.transpose(2, 1, 0)))
        put(g["dwconv"], "bias", blk(["conv.bias", "dwconv.bias"],
                                     (c.dim,), lambda v: v.reshape(-1)))
        put(g["to_u"], "kernel", blk(["to_u.weight", "to_hidden.u.weight"],
                                     (c.dim, d_e), lin_w))
        put(g["to_u"], "bias", blk(["to_u.bias", "to_hidden.u.bias"],
                                   (d_e,), lambda v: v.reshape(-1)))
        put(g["to_v"], "kernel", blk(["to_v.weight", "to_hidden.v.weight"],
                                     (c.dim, d_e), lin_w))
        put(g["to_v"], "bias", blk(["to_v.bias", "to_hidden.v.bias"],
                                   (d_e,), lambda v: v.reshape(-1)))
        put(g["to_qk"], "kernel", blk(["to_qk.weight"], (c.dim, c.qk_dim), lin_w))
        put(g["to_qk"], "bias", blk(["to_qk.bias"], (c.qk_dim,),
                                    lambda v: v.reshape(-1)))
        put(g, "gamma", blk(["offset_scale.gamma", "qk_offset_scale.gamma"],
                            (2, c.qk_dim), lambda v: v.reshape(2, c.qk_dim)))
        put(g, "beta", blk(["offset_scale.beta", "qk_offset_scale.beta"],
                           (2, c.qk_dim), lambda v: v.reshape(2, c.qk_dim)))
        put(g["to_out"], "kernel", blk(["to_out.weight"], (d_e, c.dim), lin_w))
        put(g["to_out"], "bias", blk(["to_out.bias"], (c.dim,),
                                     lambda v: v.reshape(-1)))

    put(p["ln_out"], "gamma",
        take("ln_out.weight", ["mask_net.norm_out.weight", "ln_out.weight",
                               "mask_net.norm_out.gamma"],
             (c.dim,), lambda v: v.reshape(-1)))
    put(p["ln_out"], "beta",
        take("ln_out.bias", ["mask_net.norm_out.bias", "ln_out.bias",
                             "mask_net.norm_out.beta"],
             (c.dim,), lambda v: v.reshape(-1)))
    put(p["mask_head"], "kernel",
        take("mask_head.weight",
             ["mask_net.mask_head.weight", "mask_net.conv1d_out.weight",
              "mask_head.weight"], (c.dim, c.n_src * c.enc_dim), lin_w))
    put(p["mask_head"], "bias",
        take("mask_head.bias",
             ["mask_net.mask_head.bias", "mask_net.conv1d_out.bias",
              "mask_head.bias"], (c.n_src * c.enc_dim,),
             lambda v: v.reshape(-1)))
    # decoder: torch ConvTranspose1d [enc_dim, 1, K] -> ours [K, enc_dim]
    dec = take("decoder", ["decoder.weight"], (c.enc_kernel, c.enc_dim),
               lambda v: v[:, 0, :].T if v.ndim == 3 else v)
    if dec is not None:
        p["decoder"] = dec

    # non-parameter buffers (rotary tables, bookkeeping) may ride along in a
    # real checkpoint; only unmatched WEIGHTS indicate a naming/arch mismatch.
    _buffer = ("num_batches_tracked", "rotary", "freqs", "pe", "position")
    unused = sorted(
        k for k in sd if k not in matched
        and not any(b in k.lower() for b in _buffer))
    if missing or shape_errors or unused:
        raise MossFormerImportError(missing, shape_errors, unused)
    return {"params": jax.tree.map(jnp.asarray, p)}


def load_pyannet_torch(path: str, sample_rate: int = 16000,
                       kernel_size: int = 251, stride: int = 10):
    """pyannote segmentation checkpoint -> (PyanNetConfig, params).

    The reference's OSD pipeline loads this model via
    ``OverlappedSpeechDetection.from_pretrained`` (reference:
    src/osd/osd.py:60-71); pyannote stores it as a pytorch-lightning
    checkpoint whose state_dict uses the PyanNet naming
    (``sincnet.conv1d.0.filterbank.low_hz_``, ``lstm.weight_ih_l0``,
    ``linear.0.weight``, ``classifier.weight`` ...). Everything
    architectural is inferred from tensor shapes; only the sinc kernel
    size/stride (not stored — filters are synthesized from band edges)
    come from arguments, defaulting to pyannote's 251/10.
    """
    from ..pyannet import PyanNetConfig

    import jax
    import jax.numpy as jnp

    sd = _load_state_dict(path)
    sd = {(k[len("model."):] if k.startswith("model.") else k): v
          for k, v in sd.items()}

    def want(name: str) -> np.ndarray:
        for k in sd:
            if k == name or k.endswith(name):
                return sd[k]
        raise KeyError(f"pyannet checkpoint missing tensor '{name}'")

    low = want("sincnet.conv1d.0.filterbank.low_hz_").reshape(-1, 1)
    band = want("sincnet.conv1d.0.filterbank.band_hz_").reshape(-1, 1)
    n_out = int(want("sincnet.norm1d.0.weight").shape[0])
    if low.shape[0] == n_out:
        analytic = False
    elif 2 * low.shape[0] == n_out:
        analytic = True
    else:
        raise ValueError(
            f"sinc parameter rows ({low.shape[0]}) match neither the "
            f"filter count ({n_out}) nor half of it")

    conv_channels = []
    i = 1
    while f"sincnet.conv1d.{i}.weight" in sd:
        conv_channels.append(int(sd[f"sincnet.conv1d.{i}.weight"].shape[0]))
        i += 1
    if not conv_channels:
        raise ValueError("pyannet checkpoint has no sincnet.conv1d.{1..} stages")
    conv_kernel = int(sd["sincnet.conv1d.1.weight"].shape[2])

    lstm_layers = 0
    while f"lstm.weight_ih_l{lstm_layers}" in sd:
        lstm_layers += 1
    if lstm_layers == 0:
        raise ValueError("pyannet checkpoint has no lstm.weight_ih_l0")
    hidden = int(sd["lstm.weight_hh_l0"].shape[1])
    bidirectional = "lstm.weight_ih_l0_reverse" in sd

    linear_dims = []
    i = 0
    while f"linear.{i}.weight" in sd:
        linear_dims.append(int(sd[f"linear.{i}.weight"].shape[0]))
        i += 1
    cls_w = want("classifier.weight")

    cfg = PyanNetConfig(
        sample_rate=sample_rate, n_filters=n_out, kernel_size=kernel_size,
        stride=stride, analytic=analytic, conv_channels=tuple(conv_channels),
        conv_kernel=conv_kernel, lstm_hidden=hidden, lstm_layers=lstm_layers,
        bidirectional=bidirectional, linear_dims=tuple(linear_dims),
        num_classes=int(cls_w.shape[0]),
    )

    params: Dict[str, Any] = {
        "wav_norm": {"weight": want("sincnet.wav_norm1d.weight").reshape(-1),
                     "bias": want("sincnet.wav_norm1d.bias").reshape(-1)},
        "sinc": {"low_hz": low, "band_hz": band},
        "norm0": {"weight": want("sincnet.norm1d.0.weight"),
                  "bias": want("sincnet.norm1d.0.bias")},
    }
    for j in range(1, 1 + len(conv_channels)):
        params[f"conv{j}"] = {"weight": sd[f"sincnet.conv1d.{j}.weight"],
                              "bias": sd[f"sincnet.conv1d.{j}.bias"]}
        params[f"norm{j}"] = {"weight": sd[f"sincnet.norm1d.{j}.weight"],
                              "bias": sd[f"sincnet.norm1d.{j}.bias"]}
    lstm = []
    for layer in range(lstm_layers):
        entry = {"fw": {
            "w_ih": sd[f"lstm.weight_ih_l{layer}"],
            "w_hh": sd[f"lstm.weight_hh_l{layer}"],
            "b_ih": sd[f"lstm.bias_ih_l{layer}"],
            "b_hh": sd[f"lstm.bias_hh_l{layer}"],
        }}
        if bidirectional:
            entry["bw"] = {
                "w_ih": sd[f"lstm.weight_ih_l{layer}_reverse"],
                "w_hh": sd[f"lstm.weight_hh_l{layer}_reverse"],
                "b_ih": sd[f"lstm.bias_ih_l{layer}_reverse"],
                "b_hh": sd[f"lstm.bias_hh_l{layer}_reverse"],
            }
        lstm.append(entry)
    params["lstm"] = lstm
    params["linear"] = [{"weight": sd[f"linear.{j}.weight"],
                         "bias": sd[f"linear.{j}.bias"]}
                        for j in range(len(linear_dims))]
    params["classifier"] = {"weight": cls_w, "bias": want("classifier.bias")}
    params = jax.tree_util.tree_map(
        lambda a: jnp.asarray(np.asarray(a, np.float32)), params)
    return cfg, params
