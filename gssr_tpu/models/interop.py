"""GS-SR checkpoint interop: import the reference's scaffold/octree MLP
checkpoints into MLPParams.

The reference exports decode MLPs either as a unified state-dict
`checkpoints.pth` or as per-MLP torch.jit traces
(/root/reference/gssr/gaussian/scaffold_gaussian.py:737-811, save_ckpt_mode
'unite' / 'split'). Both are plain 2-layer Sequentials
(Linear -> ReLU -> Linear [-> activation]), so the import is a transpose:
torch Linear stores weight as [out, in]; MLPParams right-multiplies
(h @ w1), i.e. [in, out].

PLY interop for the gaussian/anchor payload already exists (the reference
schemas are written/read by models/scaffold.py, models/octree.py); this
module closes the remaining gap so a GS-SR-trained scaffold or octree
model — anchors AND MLPs — can be evaluated or fine-tuned here.
"""
from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np


def _as_jnp(t):
    return jnp.asarray(np.asarray(t.detach().cpu(), np.float32))


def _pair(sd, prefix_w, prefix_b):
    """(weight.T, bias) of one torch Linear from a state-dict."""
    return _as_jnp(sd[prefix_w]).T, _as_jnp(sd[prefix_b])


def _mlp_from_state_dict(sd):
    """Sequential(Linear, ReLU, Linear, act) state-dict -> (w1,b1,w2,b2)."""
    w1, b1 = _pair(sd, "0.weight", "0.bias")
    w2, b2 = _pair(sd, "2.weight", "2.bias")
    return w1, b1, w2, b2


def load_gs_sr_mlp_checkpoint(path: str, mlp):
    """Import GS-SR MLP weights into an existing MLPParams pytree.

    path: the reference's point_cloud/iteration_* directory (or any dir)
    holding either `checkpoints.pth` (unite mode) or the split-mode
    `opacity_mlp.pt` / `cov_mlp.pt` / `color_mlp.pt`
    [/ `feature_bank_mlp.pt` / `embedding_appearance.pt`] jit traces.

    mlp: an MLPParams built with the MATCHING config (feat_dim, n_offsets,
    view/appearance dims) — shapes are validated field by field; a
    mismatch raises with both shapes named.

    Returns a new MLPParams. Requires torch (CPU build is enough).
    """
    import torch

    unite = os.path.join(path, "checkpoints.pth")
    if os.path.exists(unite):
        ckpt = torch.load(unite, map_location="cpu", weights_only=True)
        sds = {
            "op": ckpt["opacity_mlp"],
            "cov": ckpt["cov_mlp"],
            "col": ckpt["color_mlp"],
        }
        if "feature_bank_mlp" in ckpt:
            sds["fb"] = ckpt["feature_bank_mlp"]
        app_sd = ckpt.get("appearance")
        app = (_as_jnp(app_sd["embedding.weight"])
               if app_sd is not None else None)
    else:
        names = {"op": "opacity_mlp.pt", "cov": "cov_mlp.pt",
                 "col": "color_mlp.pt"}
        sds = {}
        for key, fname in names.items():
            mod = torch.jit.load(os.path.join(path, fname),
                                 map_location="cpu")
            sds[key] = dict(mod.state_dict())
        fbp = os.path.join(path, "feature_bank_mlp.pt")
        if os.path.exists(fbp):
            sds["fb"] = dict(torch.jit.load(fbp,
                                            map_location="cpu").state_dict())
        app = None
        emb = os.path.join(path, "embedding_appearance.pt")
        if os.path.exists(emb):
            esd = dict(torch.jit.load(emb, map_location="cpu").state_dict())
            app = _as_jnp(esd["embedding.weight"])

    updates = {}
    for key, dst in (("op", "op"), ("cov", "cov"), ("col", "col")):
        w1, b1, w2, b2 = _mlp_from_state_dict(sds[key])
        updates[f"{dst}_w1"], updates[f"{dst}_b1"] = w1, b1
        updates[f"{dst}_w2"], updates[f"{dst}_b2"] = w2, b2
    if "fb" in sds:
        w1, b1, w2, b2 = _mlp_from_state_dict(sds["fb"])
        updates.update(fb_w1=w1, fb_b1=b1, fb_w2=w2, fb_b2=b2)
    if app is not None:
        updates["appearance"] = app

    for name, val in updates.items():
        cur = getattr(mlp, name)
        if name == "appearance":
            # camera counts may differ between the exporting and importing
            # scenes; only the embedding width must match
            if cur.shape[1] != val.shape[1]:
                raise ValueError(
                    f"appearance width mismatch: checkpoint "
                    f"{val.shape[1]} vs config {cur.shape[1]}")
            if val.shape[0] < cur.shape[0]:
                val = jnp.concatenate(
                    [val, jnp.zeros((cur.shape[0] - val.shape[0],
                                     val.shape[1]), val.dtype)])
            updates[name] = val[:cur.shape[0]]
        elif cur.shape != val.shape:
            raise ValueError(
                f"MLP field {name}: checkpoint shape {tuple(val.shape)} != "
                f"config shape {tuple(cur.shape)} — check feat_dim/"
                f"n_offsets/appearance_dim/view_dim against the GS-SR run")
    return mlp._replace(**updates)


def _torch_linear_sd(w1, b1, w2, b2):
    """MLPParams pair -> torch Sequential(Linear,ReLU,Linear[,act])
    state-dict keys (inverse transpose of _pair)."""
    import torch

    def t(x):
        return torch.from_numpy(np.asarray(x, np.float32))

    from collections import OrderedDict
    return OrderedDict([
        ("0.weight", t(w1).T.contiguous()), ("0.bias", t(b1)),
        ("2.weight", t(w2).T.contiguous()), ("2.bias", t(b2)),
    ])


def save_gs_sr_mlp_checkpoint(path: str, mlp, use_feat_bank: bool = False):
    """Export MLPParams as the reference's unite-mode `checkpoints.pth`
    (/root/reference/gssr/gaussian/scaffold_gaussian.py:768-789), so a
    scaffold/octree model trained HERE can be loaded by the CUDA
    ecosystem's load_mlp_checkpoints. Inverse of
    load_gs_sr_mlp_checkpoint: import(export(x)) == x exactly.

    The appearance embedding is included whenever it has nonzero width
    (matching the reference's `appearance_dim > 0` branch); the feature
    bank only when use_feat_bank (the reference traces it only then).
    Returns the written file path.
    """
    import torch

    ckpt = {
        "opacity_mlp": _torch_linear_sd(mlp.op_w1, mlp.op_b1,
                                        mlp.op_w2, mlp.op_b2),
        "cov_mlp": _torch_linear_sd(mlp.cov_w1, mlp.cov_b1,
                                    mlp.cov_w2, mlp.cov_b2),
        "color_mlp": _torch_linear_sd(mlp.col_w1, mlp.col_b1,
                                      mlp.col_w2, mlp.col_b2),
    }
    if use_feat_bank:
        ckpt["feature_bank_mlp"] = _torch_linear_sd(
            mlp.fb_w1, mlp.fb_b1, mlp.fb_w2, mlp.fb_b2)
    if mlp.appearance.shape[1] > 0:
        from collections import OrderedDict
        ckpt["appearance"] = OrderedDict([
            ("embedding.weight",
             torch.from_numpy(np.asarray(mlp.appearance, np.float32)))])
    os.makedirs(path, exist_ok=True)
    out = os.path.join(path, "checkpoints.pth")
    torch.save(ckpt, out)
    return out
