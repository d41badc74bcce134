"""Temporal encoder: multi-scale strided 1-D convolutions + latent patching.

Behavioral contract (reference /root/reference/src/model/modules.py:13-154):
  * Multi_Scale_Conv_Block: 3 parallel Conv1d k in {3,5,7}, same padding, each
    followed by GroupNorm(1 group) + exact GELU; concat channels; 1x1 Conv1d with the
    block's stride (modules.py:19-41);
  * MultiScaleConvEmbedder stacks blocks per (channel_list, strides):
    default 22->64 (stride 2), 64->128 (stride 2), so L 48->24->12 (modules.py:62-88);
  * LatentPatchingProjection: 'b (p l) d -> b p (l d)' with l=patch_len, then
    Linear(patch_len*latent -> d_llm) (modules.py:90-119).

TPU-first notes: convolutions run feature-last (B, L, C) so XLA lowers them onto the
MXU as batched matmuls. With `fuse_branches` (default) the three kernel sizes are
zero-padded to the largest and concatenated along output channels, so each block's
three parallel convs execute as ONE fat conv (same math: a k=3 SAME conv equals a
k=7 SAME conv whose kernel is zero-padded symmetrically). Parameters stay separate
per branch, so checkpoints are identical between the fused and unfused paths.
GroupNorm with a single group normalizes over (L, C) jointly per sample, matching
torch GroupNorm semantics.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from tec_mollm_tpu.config import ModelConfig


class _ConvParams(nn.Module):
    """Parameter holder matching nn.Conv's {kernel, bias} naming/init, so the fused
    execution path shares checkpoints with plain nn.Conv branches."""

    features: int
    kernel_size: int
    in_features: int

    @nn.compact
    def __call__(self) -> tuple[jnp.ndarray, jnp.ndarray]:
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kernel_size, self.in_features, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class _AffineParams(nn.Module):
    """Parameter holder matching nn.GroupNorm's {scale, bias} names/shapes, so the
    lean_gn execution path shares checkpoints with plain nn.GroupNorm branches."""

    features: int

    @nn.compact
    def __call__(self) -> tuple[jnp.ndarray, jnp.ndarray]:
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return scale, bias


class MultiScaleConvBlock(nn.Module):
    out_channels: int
    stride: int
    kernel_sizes: Sequence[int] = (3, 5, 7)
    fuse_branches: bool = True
    lean_gn: bool = False
    # express the 3 branches as ONE explicit im2col gather + a single fat
    # (kmax*C_in, 3*C_out) GEMM with zero taps outside each branch's support —
    # same parameters/math as fuse_branches, but lowered as a plain MXU matmul
    # instead of XLA's conv algorithm (DESIGN §20 shape experiment: the conv
    # stage sits ~4x above its HBM/MXU floor)
    im2col: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (B, L, C_in) -> (B, L // stride, C_out)."""
        in_features = x.shape[-1]
        if self.lean_gn:
            return self._lean(x, in_features)
        if self.im2col:
            return self._im2col(x, in_features)
        norms = {
            k: nn.GroupNorm(
                num_groups=1, epsilon=1e-5, dtype=self.dtype, name=f"norm_k{k}"
            )
            for k in self.kernel_sizes
        }

        if self.fuse_branches:
            kmax = max(self.kernel_sizes)
            kernels, biases = [], []
            for k in self.kernel_sizes:
                w, b = _ConvParams(
                    self.out_channels, k, in_features, name=f"conv_k{k}"
                )()
                pad = (kmax - k) // 2
                kernels.append(jnp.pad(w, ((pad, pad), (0, 0), (0, 0))))
                biases.append(b)
            big_kernel = jnp.concatenate(kernels, axis=-1).astype(self.dtype)
            big_bias = jnp.concatenate(biases).astype(self.dtype)
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype),
                big_kernel,
                window_strides=(1,),
                padding="SAME",
                dimension_numbers=("NWC", "WIO", "NWC"),
            ) + big_bias
            branches = [
                nn.gelu(norms[k](part), approximate=False)
                for k, part in zip(
                    self.kernel_sizes,
                    jnp.split(y, len(self.kernel_sizes), axis=-1),
                )
            ]
        else:
            branches = []
            for k in self.kernel_sizes:
                h = nn.Conv(
                    self.out_channels,
                    kernel_size=(k,),
                    padding="SAME",  # == torch padding=(k-1)//2 for odd k, stride 1
                    dtype=self.dtype,
                    name=f"conv_k{k}",
                )(x)
                branches.append(nn.gelu(norms[k](h), approximate=False))

        concat = jnp.concatenate(branches, axis=-1)
        # 1x1 strided conv: picks every stride-th position (torch Conv1d k=1 stride=s)
        return nn.Conv(
            self.out_channels,
            kernel_size=(1,),
            strides=(self.stride,),
            padding="VALID",
            dtype=self.dtype,
            name="final_conv",
        )(concat)

    def _im2col(self, x: jnp.ndarray, in_features: int) -> jnp.ndarray:
        """Identical math to the fused path; one unfold + one GEMM.

        Unfold x (B, L, C) to (B, L, kmax*C) windows (SAME zero padding), then
        multiply by the per-branch kernels stacked as a (kmax*C, 3*C_out)
        matrix with zeros outside each branch's centered taps. Parameter
        names/shapes match nn.Conv exactly (checkpoint-compatible)."""
        kmax = max(self.kernel_sizes)
        norms = {
            k: nn.GroupNorm(
                num_groups=1, epsilon=1e-5, dtype=self.dtype, name=f"norm_k{k}"
            )
            for k in self.kernel_sizes
        }
        kernels, biases = [], []
        for k in self.kernel_sizes:
            w, bb = _ConvParams(
                self.out_channels, k, in_features, name=f"conv_k{k}"
            )()
            pad = (kmax - k) // 2
            kernels.append(jnp.pad(w, ((pad, pad), (0, 0), (0, 0))))
            biases.append(bb)
        # (kmax, C_in, 3*C_out) -> (kmax*C_in, 3*C_out)
        big = jnp.concatenate(kernels, axis=-1).astype(self.dtype)
        big = big.reshape(kmax * in_features, -1)
        big_bias = jnp.concatenate(biases).astype(self.dtype)

        b, length, _ = x.shape
        half = kmax // 2
        xp = jnp.pad(x.astype(self.dtype), ((0, 0), (half, half), (0, 0)))
        idx = jnp.arange(length)[:, None] + jnp.arange(kmax)[None, :]  # (L, K)
        win = xp[:, idx]                                  # (B, L, K, C_in)
        y = win.reshape(b, length, kmax * in_features) @ big + big_bias
        branches = [
            nn.gelu(norms[k](part), approximate=False)
            for k, part in zip(
                self.kernel_sizes, jnp.split(y, len(self.kernel_sizes), axis=-1)
            )
        ]
        concat = jnp.concatenate(branches, axis=-1)
        return nn.Conv(
            self.out_channels,
            kernel_size=(1,),
            strides=(self.stride,),
            padding="VALID",
            dtype=self.dtype,
            name="final_conv",
        )(concat)

    def _lean(self, x: jnp.ndarray, in_features: int) -> jnp.ndarray:
        """Same math as the unfused path, restructured around what the strided 1x1
        conv actually reads. Trace r2b: the GN+GELU elementwise fusions dominate the
        conv block (~12 ms/step of the 117 ms flagship step) while the conv GEMMs
        run near roofline. Two wastes removed here:
          * the final conv (k=1, stride s) reads only every s-th position, yet
            normalize+GELU ran at ALL positions — only the GroupNorm *statistics*
            need the full length, so slice first, normalize half the data;
          * the 3-branch concat materialized (B, L, 3*C) just to feed one matmul —
            instead the final kernel is split per branch and the partial matmuls
            are summed, so the concat buffer never exists.
        Parameter names/shapes/inits are identical to the unfused path (same
        checkpoints); GroupNorm stats use single-pass E[x^2]-mu^2 in fp32 (same
        stance as gpt2._lean_layernorm)."""
        c = self.out_channels
        wf, bf = _ConvParams(
            c, 1, len(self.kernel_sizes) * c, name="final_conv"
        )()
        wf = wf[0]  # (3*C, C_out): nn.Conv k=1 kernel without the window axis
        out = None
        for i, k in enumerate(self.kernel_sizes):
            h = nn.Conv(
                c,
                kernel_size=(k,),
                padding="SAME",
                dtype=self.dtype,
                name=f"conv_k{k}",
            )(x)
            gs, gb = _AffineParams(c, name=f"norm_k{k}")()
            hf = h.astype(jnp.float32)
            mean = jnp.mean(hf, axis=(-2, -1), keepdims=True)
            var = jnp.mean(jnp.square(hf), axis=(-2, -1), keepdims=True) - jnp.square(mean)
            inv = jax.lax.rsqrt(var + 1e-5)
            hs = h[:, :: self.stride].astype(jnp.float32)
            norm = ((hs - mean) * inv).astype(h.dtype)
            act = nn.gelu(
                norm * gs.astype(h.dtype) + gb.astype(h.dtype), approximate=False
            )
            part = act @ wf[i * c : (i + 1) * c].astype(self.dtype)
            out = part if out is None else out + part
        return out + bf.astype(self.dtype)


class LatentPatchingProjection(nn.Module):
    patch_len: int
    d_llm: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (B, L, D) -> (B, L // patch_len, d_llm).

        The (p l) d -> p (l d) flatten keeps patch-position-major order exactly like
        the reference's einops rearrange (modules.py:114).
        """
        b, length, d = x.shape
        p = length // self.patch_len
        x = x.reshape(b, p, self.patch_len * d)
        return nn.Dense(self.d_llm, dtype=self.dtype, name="projection")(x)


class TemporalEncoder(nn.Module):
    cfg: ModelConfig
    dtype: jnp.dtype = jnp.float32
    fuse_branches: bool = True
    lean_gn: bool = False
    im2col: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (B, L_in, C) -> (B, num_patches, d_llm). Feature-last throughout
        (the reference permutes to channels-first for torch Conv1d; XLA prefers NLC)."""
        cfg = self.cfg
        for i, (ch, stride) in enumerate(
            zip(cfg.temporal_channel_list, cfg.temporal_strides)
        ):
            x = MultiScaleConvBlock(
                out_channels=ch,
                stride=stride,
                kernel_sizes=cfg.conv_kernel_sizes,
                fuse_branches=self.fuse_branches,
                lean_gn=self.lean_gn,
                im2col=self.im2col,
                dtype=self.dtype,
                name=f"block_{i}",
            )(x)
        return LatentPatchingProjection(
            patch_len=cfg.effective_patch_len,
            d_llm=cfg.d_llm,
            dtype=self.dtype,
            name="patcher",
        )(x)
