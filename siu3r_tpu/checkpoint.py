"""PyTorch checkpoint -> JAX parameter conversion.

Maps the reference's torch ``state_dict`` layout (SIU3RModel, reference
src/models/model.py) onto this package's flax variable tree, including the
nn.scan-stacked transformer blocks (per-layer tensors stacked on axis 0).

Layout transforms:
  * Linear weight [out, in] -> Dense kernel [in, out]
  * Conv2d weight [O, I, kh, kw] -> Conv kernel [kh, kw, I, O]
    (depthwise convs follow the same rule: [O, 1, kh, kw] -> [kh, kw, 1, O])
  * ConvTranspose2d weight [I, O, kh, kw] -> [kh, kw, O, I]
    (ConvTranspose2dTorch kernel layout)
  * LayerNorm/GroupNorm weight -> scale
  * BatchNorm running stats -> the ``batch_stats`` collection
  * nn.MultiheadAttention packed in_proj -> split q/k/v Dense kernels

Also implements the reference's checkpoint surgeries:
  * ``filter_recon_ckpt``: MASt3R/DUSt3R init — patch-embed resampling,
    dec_blocks duplication into dec_blocks2, confidence-channel stripping
    (reference src/utils/weight_modify.py:163-228,
    backbone_croco.py:106-113)
  * ``filter_seg_ckpt``: COCO/ADE20k ViT-Adapter+mask-decoder init — drop
    class_predictor/criterion/backbone, zero-pad query embeddings
    (reference src/models/model.py:138-176)
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import numpy as np

from siu3r_tpu.config import ModelCfg


Tree = Dict[str, Any]


def _t(w) -> np.ndarray:
    return np.asarray(w)


def _linear(state, prefix) -> Tree:
    """None when absent — pretrained checkpoints cover only subtrees and
    missing leaves stay at init (reference load_state_dict strict=False)."""
    if f"{prefix}.weight" not in state:
        return None
    out = {"kernel": _t(state[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in state:
        out["bias"] = _t(state[f"{prefix}.bias"])
    return out


def _conv(state, prefix) -> Tree:
    if f"{prefix}.weight" not in state:
        return None
    out = {"kernel": _t(state[f"{prefix}.weight"]).transpose(2, 3, 1, 0)}
    if f"{prefix}.bias" in state:
        out["bias"] = _t(state[f"{prefix}.bias"])
    return out


def _conv_transpose(state, prefix) -> Tree:
    if f"{prefix}.weight" not in state:
        return None
    out = {"kernel": _t(state[f"{prefix}.weight"]).transpose(2, 3, 1, 0)}
    if f"{prefix}.bias" in state:
        out["bias"] = _t(state[f"{prefix}.bias"])
    return out


def _norm(state, prefix) -> Tree:
    if f"{prefix}.weight" not in state:
        return None
    return {
        "scale": _t(state[f"{prefix}.weight"]),
        "bias": _t(state[f"{prefix}.bias"]),
    }


def _bn(state, prefix):
    if f"{prefix}.weight" not in state:
        return None, None
    params = _norm(state, prefix)
    stats = {
        "mean": _t(state[f"{prefix}.running_mean"]),
        "var": _t(state[f"{prefix}.running_var"]),
    }
    return params, stats


def _prune(tree):
    """Drop None leaves / empty subtrees produced by missing keys."""
    if isinstance(tree, dict):
        out = {}
        for k, v in tree.items():
            pv = _prune(v)
            if pv is not None and (not isinstance(pv, dict) or pv):
                out[k] = pv
        return out
    return tree


def _mha(state, prefix) -> Tree:
    """torch nn.MultiheadAttention -> {q,k,v,out}_proj Dense trees."""
    w = _t(state[f"{prefix}.in_proj_weight"])
    b = _t(state[f"{prefix}.in_proj_bias"])
    c = w.shape[1]
    return {
        "q_proj": {"kernel": w[:c].T, "bias": b[:c]},
        "k_proj": {"kernel": w[c : 2 * c].T, "bias": b[c : 2 * c]},
        "v_proj": {"kernel": w[2 * c :].T, "bias": b[2 * c :]},
        "out_proj": _linear(state, f"{prefix}.out_proj"),
    }


def _stack(trees: List[Tree]) -> Tree:
    """Stack per-layer param trees along axis 0 (nn.scan layout)."""
    out: Tree = {}
    for key in trees[0]:
        vals = [t[key] for t in trees]
        if isinstance(vals[0], dict):
            out[key] = _stack(vals)
        else:
            out[key] = np.stack(vals, axis=0)
    return out


def _enc_block(state, p) -> Tree:
    return {
        "norm1": _norm(state, f"{p}.norm1"),
        "attn": {
            "qkv": _linear(state, f"{p}.attn.qkv"),
            "proj": _linear(state, f"{p}.attn.proj"),
        },
        "norm2": _norm(state, f"{p}.norm2"),
        "mlp": {
            "fc1": _linear(state, f"{p}.mlp.fc1"),
            "fc2": _linear(state, f"{p}.mlp.fc2"),
        },
    }


def _dec_block(state, p) -> Tree:
    return {
        "norm1": _norm(state, f"{p}.norm1"),
        "attn": {
            "qkv": _linear(state, f"{p}.attn.qkv"),
            "proj": _linear(state, f"{p}.attn.proj"),
        },
        "cross_attn": {
            "projq": _linear(state, f"{p}.cross_attn.projq"),
            "projk": _linear(state, f"{p}.cross_attn.projk"),
            "projv": _linear(state, f"{p}.cross_attn.projv"),
            "proj": _linear(state, f"{p}.cross_attn.proj"),
        },
        "norm2": _norm(state, f"{p}.norm2"),
        "norm3": _norm(state, f"{p}.norm3"),
        "norm_y": _norm(state, f"{p}.norm_y"),
        "mlp": {
            "fc1": _linear(state, f"{p}.mlp.fc1"),
            "fc2": _linear(state, f"{p}.mlp.fc2"),
        },
    }


def convert_backbone(state: Dict[str, np.ndarray], cfg: ModelCfg) -> Tree:
    c = cfg.croco
    enc = [_enc_block(state, f"backbone.enc_blocks.{i}") for i in range(c.enc_depth)]
    dec1 = [_dec_block(state, f"backbone.dec_blocks.{i}") for i in range(c.dec_depth)]
    dec2 = [_dec_block(state, f"backbone.dec_blocks2.{i}") for i in range(c.dec_depth)]
    dec_pairs = _stack(
        [{"block1": d1, "block2": d2} for d1, d2 in zip(dec1, dec2)]
    )
    return _prune({
        "patch_embed": {"proj": _conv(state, "backbone.patch_embed.proj")},
        "intrinsic_encoder": _linear(state, "backbone.intrinsic_encoder"),
        "enc_blocks": {"block": _stack(enc)},
        "enc_norm": _norm(state, "backbone.enc_norm"),
        "decoder_embed": _linear(state, "backbone.decoder_embed"),
        "dec_blocks": dec_pairs,
        "dec_norm": _norm(state, "backbone.dec_norm"),
    })


def _dpt_head(state, p, head_type: str) -> Tree:
    out: Tree = {
        "act_0_conv": _conv(state, f"{p}.dpt.act_postprocess.0.0"),
        "act_0_up": _conv_transpose(state, f"{p}.dpt.act_postprocess.0.1"),
        "act_1_conv": _conv(state, f"{p}.dpt.act_postprocess.1.0"),
        "act_1_up": _conv_transpose(state, f"{p}.dpt.act_postprocess.1.1"),
        "act_2_conv": _conv(state, f"{p}.dpt.act_postprocess.2.0"),
        "act_3_conv": _conv(state, f"{p}.dpt.act_postprocess.3.0"),
        "act_3_down": _conv(state, f"{p}.dpt.act_postprocess.3.1"),
    }
    for i in range(1, 5):
        out[f"layer{i}_rn"] = _conv(state, f"{p}.dpt.scratch.layer{i}_rn")
        rf = f"{p}.dpt.scratch.refinenet{i}"
        out[f"refinenet{i}"] = {
            "resConfUnit1": {
                "conv1": _conv(state, f"{rf}.resConfUnit1.conv1"),
                "conv2": _conv(state, f"{rf}.resConfUnit1.conv2"),
            },
            "resConfUnit2": {
                "conv1": _conv(state, f"{rf}.resConfUnit2.conv1"),
                "conv2": _conv(state, f"{rf}.resConfUnit2.conv2"),
            },
            "out_conv": _conv(state, f"{rf}.out_conv"),
        }
    if head_type == "regression":
        out["head_conv1"] = _conv(state, f"{p}.dpt.head.0")
        out["head_conv2"] = _conv(state, f"{p}.dpt.head.2")
        out["head_conv3"] = _conv(state, f"{p}.dpt.head.4")
    else:  # gs_params
        out["input_merger"] = _conv(state, f"{p}.dpt.input_merger.0")
        out["head_conv1"] = _conv(state, f"{p}.dpt.head.0")
        out["head_conv2"] = _conv(state, f"{p}.dpt.head.4")
    return out


def _msdeform(state, p) -> Tree:
    return {
        "sampling_offsets": _linear(state, f"{p}.sampling_offsets"),
        "attention_weights": _linear(state, f"{p}.attention_weights"),
        "value_proj": _linear(state, f"{p}.value_proj"),
        "output_proj": _linear(state, f"{p}.output_proj"),
    }


def _extractor(state, p):
    params = {
        "query_norm": _norm(state, f"{p}.query_norm"),
        "feat_norm": _norm(state, f"{p}.feat_norm"),
        "attn": _msdeform(state, f"{p}.attn"),
        "ffn_norm": _norm(state, f"{p}.ffn_norm"),
        "ffn": {
            "fc1": _linear(state, f"{p}.ffn.fc1"),
            "fc2": _linear(state, f"{p}.ffn.fc2"),
            "dwconv": {"dwconv": _conv(state, f"{p}.ffn.dwconv.dwconv")},
        },
    }
    return params


def convert_adapter(state: Dict[str, np.ndarray], cfg: ModelCfg):
    """Returns (params, batch_stats) for the adapter."""
    params: Tree = {"level_embed": _t(state["adapter.level_embed"])}
    stats: Tree = {}

    def conv_bn(dst, src_conv, src_bn):
        p, s = _bn(state, src_bn)
        params.setdefault("spm", {})[dst] = {
            "conv": _conv(state, src_conv),
            "norm": {"bn": p},
        }
        stats.setdefault("spm", {})[dst] = {"norm": {"bn": s}}

    conv_bn("stem1", "adapter.spm.stem.0", "adapter.spm.stem.1")
    conv_bn("stem2", "adapter.spm.stem.3", "adapter.spm.stem.4")
    conv_bn("stem3", "adapter.spm.stem.6", "adapter.spm.stem.7")
    conv_bn("conv2", "adapter.spm.conv2.0", "adapter.spm.conv2.1")
    conv_bn("conv3", "adapter.spm.conv3.0", "adapter.spm.conv3.1")
    conv_bn("conv4", "adapter.spm.conv4.0", "adapter.spm.conv4.1")
    for i in range(1, 5):
        params["spm"][f"fc{i}"] = _conv(state, f"adapter.spm.fc{i}")

    n_inter = 4
    for i in range(n_inter):
        p = f"adapter.interactions.{i}"
        tree: Tree = {"extractor": _extractor(state, f"{p}.extractor")}
        if f"{p}.extra_extractors.0.query_norm.weight" in state:
            for j in range(2):
                tree[f"extra_extractors_{j}"] = _extractor(
                    state, f"{p}.extra_extractors.{j}"
                )
        params[f"interactions_{i}"] = tree

    params["up"] = _conv_transpose(state, "adapter.up")
    for i in range(1, 5):
        p, s = _bn(state, f"adapter.norm{i}")
        params[f"norm{i}"] = {"bn": p}
        stats[f"norm{i}"] = {"bn": s}
    return params, stats


def convert_mask2former(state: Dict[str, np.ndarray], cfg: ModelCfg) -> Tree:
    m = cfg.mask2former
    pd = "mask2former.model.pixel_decoder"
    pixel_decoder: Tree = {
        "level_embed": _t(state[f"{pd}.level_embed"]),
        "mask_projection": _conv(state, f"{pd}.mask_projection"),
        "adapter_1": {
            "conv": _conv(state, f"{pd}.adapter_1.0"),
            "norm": _norm(state, f"{pd}.adapter_1.1"),
        },
        "layer_1_conv": _conv(state, f"{pd}.layer_1.0"),
        "layer_1_norm": _norm(state, f"{pd}.layer_1.1"),
    }
    for i in range(3):
        pixel_decoder[f"input_projections_{i}"] = {
            "conv": _conv(state, f"{pd}.input_projections.{i}.0"),
            "norm": _norm(state, f"{pd}.input_projections.{i}.1"),
        }
    for i in range(m.encoder_layers):
        p = f"{pd}.encoder.layers.{i}"
        pixel_decoder[f"encoder_layers_{i}"] = {
            **_msdeform(state, f"{p}.self_attn"),
            "self_attn_layer_norm": _norm(state, f"{p}.self_attn_layer_norm"),
            "fc1": _linear(state, f"{p}.fc1"),
            "fc2": _linear(state, f"{p}.fc2"),
            "final_layer_norm": _norm(state, f"{p}.final_layer_norm"),
        }

    tm = "mask2former.model.transformer_module"
    transformer: Tree = {
        "level_embed": {"embedding": _t(state[f"{tm}.level_embed.weight"])},
        "queries_embedder": {"embedding": _t(state[f"{tm}.queries_embedder.weight"])},
        "queries_features": {"embedding": _t(state[f"{tm}.queries_features.weight"])},
        "layernorm": _norm(state, f"{tm}.decoder.layernorm"),
        "mask_predictor": {
            "mask_embedder": {
                f"layers_{i}": _linear(
                    state, f"{tm}.decoder.mask_predictor.mask_embedder.{i}.0"
                )
                for i in range(3)
            }
        },
    }
    for i in range(m.decoder_layers - 1):
        p = f"{tm}.decoder.layers.{i}"
        transformer[f"layers_{i}"] = {
            "cross_attn": _mha(state, f"{p}.cross_attn"),
            "self_attn": {
                "q_proj": _linear(state, f"{p}.self_attn.q_proj"),
                "k_proj": _linear(state, f"{p}.self_attn.k_proj"),
                "v_proj": _linear(state, f"{p}.self_attn.v_proj"),
                "out_proj": _linear(state, f"{p}.self_attn.out_proj"),
            },
            "cross_attn_layer_norm": _norm(state, f"{p}.cross_attn_layer_norm"),
            "self_attn_layer_norm": _norm(state, f"{p}.self_attn_layer_norm"),
            "fc1": _linear(state, f"{p}.fc1"),
            "fc2": _linear(state, f"{p}.fc2"),
            "final_layer_norm": _norm(state, f"{p}.final_layer_norm"),
        }

    out: Tree = {
        "pixel_decoder": pixel_decoder,
        "transformer_module": transformer,
        "class_predictor": _linear(state, "mask2former.class_predictor"),
    }
    out = _prune(out)
    if "mask2former.lang_cross_attns.0.in_proj_weight" in state:
        for i in range(6):
            out[f"lang_cross_attns_{i}"] = _mha(
                state, f"mask2former.lang_cross_attns.{i}"
            )
            out[f"lang_attn_norms_{i}"] = _norm(
                state, f"mask2former.lang_attn_norms.{i}"
            )
            out[f"lang_attn_norms_final_{i}"] = _norm(
                state, f"mask2former.lang_attn_norms_final.{i}"
            )
            out[f"lang_fc1s_{i}"] = _linear(state, f"mask2former.lang_fc1s.{i}")
            out[f"lang_fc2s_{i}"] = _linear(state, f"mask2former.lang_fc2s.{i}")
    return out


def convert_siu3r_state_dict(state: Dict[str, np.ndarray], cfg: ModelCfg):
    """Full SIU3RModel torch state_dict -> flax ``variables`` dict."""
    state = {k: np.asarray(v) for k, v in state.items()}
    adapter_params, adapter_stats = convert_adapter(state, cfg)
    params: Tree = {
        "backbone": convert_backbone(state, cfg),
        "adapter": adapter_params,
        "mask2former": convert_mask2former(state, cfg),
        "downstream_head1": _dpt_head(state, "downstream_head1", "regression"),
        "downstream_head2": _dpt_head(state, "downstream_head2", "regression"),
        "gaussian_param_head1": _dpt_head(state, "gaussian_param_head1", "gs_params"),
        "gaussian_param_head2": _dpt_head(state, "gaussian_param_head2", "gs_params"),
    }
    batch_stats: Tree = {"adapter": adapter_stats}
    return {"params": params, "batch_stats": batch_stats}


# ---------------------------------------------------------------------------
# Pretrained-init surgeries (reference src/utils/weight_modify.py:163-228,
# src/models/model.py:116-176, backbone_croco.py:106-113)
# ---------------------------------------------------------------------------


def resample_patch_embed_kernel(kernel: np.ndarray, new_hw) -> np.ndarray:
    """FlexiViT pseudo-inverse patch-kernel resampling
    (reference weight_modify.py:13-93). kernel [O, I, H, W] -> [O, I, h, w].
    Uses torch bicubic+antialias resizing to build the resize matrix, exactly
    like the reference (host-side checkpoint prep only)."""
    import torch
    import torch.nn.functional as F

    old = kernel.shape[-2:]
    if tuple(old) == tuple(new_hw):
        return kernel

    def resize(x):
        t = torch.from_numpy(x.astype(np.float32))[None, None]
        return F.interpolate(
            t, size=tuple(new_hw), mode="bicubic", antialias=True
        )[0, 0].numpy()

    mat = []
    for i in range(int(np.prod(old))):
        basis = np.zeros(old, np.float32)
        basis[np.unravel_index(i, old)] = 1.0
        mat.append(resize(basis).reshape(-1))
    resize_mat_pinv = np.linalg.pinv(np.stack(mat).T.T)

    o, i_ch = kernel.shape[:2]
    flat = kernel.reshape(o * i_ch, -1).astype(np.float32)
    out = (resize_mat_pinv @ flat.T).T
    return out.reshape(o, i_ch, *new_hw)


def adapt_input_conv(in_chans: int, w: np.ndarray) -> np.ndarray:
    """reference weight_modify.py:96-125"""
    o, i, j, k = w.shape
    w = w.astype(np.float32)
    if in_chans == 1:
        return w.sum(axis=1, keepdims=True)
    if in_chans != 3:
        if i != 3:
            raise NotImplementedError
        repeat = -(-in_chans // 3)
        w = np.tile(w, (1, repeat, 1, 1))[:, :in_chans]
        w *= 3.0 / in_chans
    return w


def adapt_linear(w: np.ndarray) -> np.ndarray:
    """Widen a linear layer's input (reference weight_modify.py:145-160):
    81-way column-split means appended, both halves scaled 0.5."""
    chunks = np.array_split(w.astype(np.float32), 81, axis=1)
    means = np.concatenate([c.mean(axis=1, keepdims=True) for c in chunks], axis=1)
    return np.concatenate([w * 0.5, means * 0.5], axis=1)


def filter_recon_state(
    state: Dict[str, np.ndarray], cfg: ModelCfg
) -> Dict[str, np.ndarray]:
    """MASt3R/DUSt3R checkpoint -> SIU3R layout (reference
    checkpoint_filter_fn weight_modify.py:163-228 + the dec_blocks2
    duplication in backbone_croco.py:106-113):
      * patch-embed kernel pinv-resampled to the configured patch size,
        input channels adapted;
      * decoder_embed input widened when dims mismatch;
      * every key prefixed ``backbone.`` except the downstream heads;
      * dec_blocks duplicated into dec_blocks2 when absent;
      * confidence output channel stripped from the pts3d head out conv.
    """
    state = {k: np.asarray(v) for k, v in state.items()}
    p = cfg.croco.patch_size
    out: Dict[str, np.ndarray] = {}
    for k, v in state.items():
        if "patch_embed.proj.weight" in k:
            if v.shape[-1] != p or v.shape[-2] != p:
                v = resample_patch_embed_kernel(v, (p, p))
            if v.shape[1] != 3:
                v = adapt_input_conv(3, v)
        elif "decoder_embed.weight" in k:
            if v.shape[1] != cfg.croco.enc_embed_dim:
                v = adapt_linear(v)
        out[k] = v

    if not any(k.startswith("dec_blocks2") for k in out):
        for k in list(out.keys()):
            if k.startswith("dec_blocks."):
                out[k.replace("dec_blocks.", "dec_blocks2.", 1)] = out[k]

    prefixed = {
        (k if "downstream_head" in k else "backbone." + k): v
        for k, v in out.items()
    }
    for head in ("downstream_head1", "downstream_head2"):
        wk = f"{head}.dpt.head.4.weight"
        bk = f"{head}.dpt.head.4.bias"
        if wk in prefixed and prefixed[wk].shape[0] > 3:
            prefixed[wk] = prefixed[wk][:3]
            prefixed[bk] = prefixed[bk][:3]
    return prefixed


def filter_seg_state(
    state: Dict[str, np.ndarray], cfg: ModelCfg, prefix: str = "model."
) -> Dict[str, np.ndarray]:
    """COCO/ADE20k ViT-Adapter + mask-decoder checkpoint surgery
    (reference model.py:138-176): drop class_predictor / criterion /
    backbone keys, zero-pad query embeddings to the configured query count,
    strip the pipeline prefix."""
    out: Dict[str, np.ndarray] = {}
    nq = cfg.mask2former.num_queries
    for k, v in state.items():
        if "class_predictor" in k or "criterion" in k or "backbone" in k:
            continue
        key = k[len(prefix):] if k.startswith(prefix) else k
        v = np.asarray(v)
        if "queries_embedder" in k or "queries_features" in k:
            padded = np.zeros((nq, v.shape[1]), v.dtype)
            padded[: min(nq, v.shape[0])] = v[:nq]
            v = padded
        out[key] = v
    return out


def _merge(dst: Tree, src: Tree) -> None:
    for k, v in src.items():
        if isinstance(v, dict) and isinstance(dst.get(k), dict):
            _merge(dst[k], v)
        else:
            dst[k] = v


def init_from_pretrained(
    variables,
    cfg: ModelCfg,
    recon_ckpt: Optional[str] = None,
    seg_ckpt: Optional[str] = None,
):
    """Training init (reference Pipeline.setup pipeline.py:41-44): overlay
    MASt3R/DUSt3R recon weights and COCO/ADE20k segmentation weights onto a
    randomly initialized variable tree. Returns new variables."""
    import copy

    import torch

    variables = jax.tree_util.tree_map(lambda x: x, variables)  # shallow copy
    params = copy.deepcopy(
        jax.tree_util.tree_map(np.asarray, variables["params"])
    )
    batch_stats = copy.deepcopy(
        jax.tree_util.tree_map(np.asarray, variables.get("batch_stats", {}))
    )
    if recon_ckpt is not None:
        blob = torch.load(recon_ckpt, map_location="cpu", weights_only=False)
        state = blob.get("model", blob)
        state = {k: v.numpy() for k, v in state.items()}
        filtered = filter_recon_state(state, cfg)
        stripped = {
            k[len("backbone."):]: v
            for k, v in filtered.items()
            if k.startswith("backbone.")
        }
        full = {("backbone." + k): v for k, v in stripped.items()}
        full.update(
            {k: v for k, v in filtered.items() if "downstream_head" in k}
        )
        _merge(params, {"backbone": convert_backbone(full, cfg)})
        for head in ("downstream_head1", "downstream_head2"):
            if any(k.startswith(head) for k in full):
                _merge(params, {head: _dpt_head(full, head, "regression")})
    if seg_ckpt is not None:
        blob = torch.load(seg_ckpt, map_location="cpu", weights_only=False)
        state = blob.get("state_dict", blob)
        state = {k: np.asarray(v) for k, v in state.items()}
        filtered = filter_seg_state(state, cfg)
        adapter_params, adapter_stats = convert_adapter(filtered, cfg)
        _merge(params, {"adapter": adapter_params})
        _merge(batch_stats, {"adapter": adapter_stats})
        m2f = convert_mask2former(filtered, cfg)
        m2f.pop("class_predictor", None)  # label count differs; keep init
        _merge(params, {"mask2former": m2f})
    return {"params": params, "batch_stats": batch_stats}



def load_torch_checkpoint(path: str, cfg: ModelCfg, prefix: str = "model."):
    """Load a Lightning .ckpt (reference Pipeline checkpoint) and convert.
    Strips the pipeline prefix (``model.``) like Pipeline.load_from_checkpoint."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state = ckpt.get("state_dict", ckpt)
    state = {
        (k[len(prefix):] if k.startswith(prefix) else k): v.numpy()
        for k, v in state.items()
    }
    return convert_siu3r_state_dict(state, cfg)
