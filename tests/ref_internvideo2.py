"""Import the REFERENCE torch InternVideo2 module (read-only, CPU) as the
golden oracle. The reference hard-requires CUDA flash-attn; this file stubs
`flash_attn` (varlen attention, FusedMLP, DropoutAddRMSNorm) and
`timm.models.layers` with CPU torch math implementing the same published
semantics, so the reference module itself executes unmodified — except
FlashAttention.forward, whose `qkv.is_cuda` assert is monkeypatched out
(the replacement dispatches to the same shimmed kernel with the same
arguments). Nothing from the reference is copied; its code runs as the
oracle."""
import sys
import types

import numpy as np

REF = "/root/reference/VideoGLaMM"


def _stub(name, **attrs):
    if name in sys.modules:
        m = sys.modules[name]
    else:
        import importlib.machinery
        m = types.ModuleType(name)
        # a real ModuleSpec so importlib.util.find_spec (e.g. transformers'
        # availability probes) doesn't choke on the stub
        m.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
        sys.modules[name] = m
    for k, v in attrs.items():
        setattr(m, k, v)
    return m


def _install_shims():
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    # ---- timm.models.layers ------------------------------------------
    def to_2tuple(x):
        return x if isinstance(x, tuple) else (x, x)

    class DropPath(nn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            if self.drop_prob == 0.0 or not self.training:
                return x
            keep = 1 - self.drop_prob
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            mask = torch.bernoulli(torch.full(shape, keep, device=x.device))
            return x * mask / keep

    _stub("timm")
    _stub("timm.models")
    _stub("timm.models.layers", DropPath=DropPath, to_2tuple=to_2tuple,
          trunc_normal_=torch.nn.init.trunc_normal_)

    # ---- flash_attn ---------------------------------------------------
    def flash_attn_varlen_qkvpacked_func(qkv, cu_seqlens, max_s,
                                         dropout_p=0.0, softmax_scale=None,
                                         causal=False):
        """CPU SDPA with flash-attn's varlen qkv-packed signature.
        qkv: [nnz, 3, H, D]; cu_seqlens: [B+1] int32."""
        scale = softmax_scale or qkv.shape[-1] ** -0.5
        outs = []
        for i in range(len(cu_seqlens) - 1):
            s, e = int(cu_seqlens[i]), int(cu_seqlens[i + 1])
            q, k, v = qkv[s:e].unbind(1)            # [L, H, D]
            q, k, v = (t.transpose(0, 1) for t in (q, k, v))  # [H, L, D]
            attn = (q * scale) @ k.transpose(-1, -2)
            if causal:
                L = attn.shape[-1]
                attn = attn.masked_fill(
                    torch.triu(torch.ones(L, L, dtype=torch.bool), 1), -1e9)
            out = attn.softmax(-1) @ v              # [H, L, D]
            outs.append(out.transpose(0, 1))        # [L, H, D]
        return torch.cat(outs)

    def unpad_input(x, mask):
        B, S = mask.shape
        lens = mask.sum(1, dtype=torch.int32)
        cu = torch.cat([torch.zeros(1, dtype=torch.int32),
                        torch.cumsum(lens, 0, dtype=torch.int32)])
        idx = torch.nonzero(mask.flatten(), as_tuple=False).flatten()
        return x.reshape(B * S, *x.shape[2:])[idx], idx, cu, int(lens.max())

    def pad_input(x_unpad, indices, batch, seqlen):
        out = torch.zeros(batch * seqlen, *x_unpad.shape[1:],
                          dtype=x_unpad.dtype)
        out[indices] = x_unpad
        return out.reshape(batch, seqlen, *x_unpad.shape[1:])

    class FusedMLP(nn.Module):
        """flash-attn FusedMLP: fc1 -> tanh-approx GELU -> fc2."""

        def __init__(self, in_features, hidden_features, heuristic=1,
                     **kw):
            super().__init__()
            self.fc1 = nn.Linear(in_features, hidden_features)
            self.fc2 = nn.Linear(hidden_features, in_features)

        def forward(self, x):
            return self.fc2(F.gelu(self.fc1(x), approximate="tanh"))

    class DropoutAddRMSNorm(nn.Module):
        """flash-attn DropoutAddRMSNorm (dropout=0 path): pre = x
        (+ residual); out = RMSNorm_fp32(pre) * weight; prenorm=True
        returns (out, pre)."""

        def __init__(self, dim, eps=1e-6, prenorm=False, p=0.0, **kw):
            super().__init__()
            self.weight = nn.Parameter(torch.ones(dim))
            self.eps = eps
            self.prenorm = prenorm

        def forward(self, x, residual=None):
            pre = x if residual is None else x + residual
            xf = pre.float()
            out = xf * torch.rsqrt(xf.pow(2).mean(-1, keepdim=True)
                                   + self.eps)
            out = (out * self.weight.float()).to(x.dtype)
            return (out, pre) if self.prenorm else out

    _stub("flash_attn")
    _stub("flash_attn.flash_attn_interface",
          flash_attn_varlen_qkvpacked_func=flash_attn_varlen_qkvpacked_func)
    _stub("flash_attn.bert_padding", unpad_input=unpad_input,
          pad_input=pad_input)
    _stub("flash_attn.modules")
    _stub("flash_attn.modules.mlp", FusedMLP=FusedMLP)
    _stub("flash_attn.ops")
    _stub("flash_attn.ops.rms_norm", DropoutAddRMSNorm=DropoutAddRMSNorm)
    return flash_attn_varlen_qkvpacked_func


def load_reference_internvideo2():
    """Returns the reference internvideo2 module, shims installed."""
    if REF not in sys.path:
        sys.path.insert(0, REF)
    varlen = _install_shims()

    import importlib
    fa_cls = importlib.import_module(
        "model.videogpt_plus.model.internvideo.flash_attention_class")

    # the reference forward asserts qkv.is_cuda / fp16 — patch in a CPU
    # dispatcher that makes the identical kernel call
    import torch
    from einops import rearrange

    def _cpu_forward(self, qkv, key_padding_mask=None, causal=False,
                     cu_seqlens=None, max_s=None, need_weights=False):
        assert not need_weights and key_padding_mask is None \
            and cu_seqlens is None
        batch_size, seqlen = qkv.shape[0], qkv.shape[1]
        qkv = rearrange(qkv, "b s ... -> (b s) ...")
        cu = torch.arange(0, (batch_size + 1) * seqlen, step=seqlen,
                          dtype=torch.int32)
        out = varlen(qkv, cu, seqlen,
                     self.dropout_p if self.training else 0.0,
                     softmax_scale=self.softmax_scale, causal=causal)
        return rearrange(out, "(b s) ... -> b s ...", b=batch_size), None

    fa_cls.FlashAttention.forward = _cpu_forward

    return importlib.import_module(
        "model.videogpt_plus.model.internvideo.internvideo2")


def build_reference_internvideo2(cfg, seed: int = 0):
    """Construct the reference PretrainInternVideo2 matching an
    InternVideo2Config (deployed flags: flash attn + fused rmsnorm + fused
    mlp), randomized weights, eval mode."""
    mod = load_reference_internvideo2()
    import torch
    torch.manual_seed(seed)
    model = mod.PretrainInternVideo2(
        in_chans=3, img_size=cfg.image_size, patch_size=cfg.patch_size,
        embed_dim=cfg.embed_dim, depth=cfg.depth, num_heads=cfg.num_heads,
        mlp_ratio=cfg.mlp_ratio, qkv_bias=cfg.qkv_bias,
        init_values=cfg.init_values, qk_normalization=cfg.qk_normalization,
        drop_path_rate=0.0,
        use_flash_attn=True, use_fused_rmsnorm=True, use_fused_mlp=True,
        num_frames=cfg.num_frames, tubelet_size=cfg.tubelet_size,
        attn_pool_num_heads=cfg.attn_pool_num_heads,
        clip_embed_dim=cfg.clip_embed_dim,
        clip_teacher_embed_dim=8, clip_teacher_final_dim=8,
        clip_return_layer=1)
    # randomize the norm weights away from 1 so parity is meaningful
    with torch.no_grad():
        for name, p in model.named_parameters():
            if name.endswith("norm1.weight") or name.endswith("norm2.weight") \
                    or "q_norm" in name or "k_norm" in name:
                p.copy_(torch.rand_like(p) * 0.5 + 0.75)
    model.eval()
    return model
