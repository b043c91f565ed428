"""Tri-oriented Mamba module ("bimamba v3"), TPU-native.

Rebuild of the reference ``Mamba`` module with ``bimamba_type="v3"``
(/root/reference/mamba/mamba_ssm/modules/mamba_simple.py:34-264): three
independent parameter sets — forward, backward (flipped sequence) and
inter-slice (slice-interleaved sequence) — each running the fused
conv1d + projections + selective-scan inner op, summed before a shared
output projection (mamba_simple.py:215-264).

Initialization parity with the reference:
- dt_proj weight U(±dt_rank^-0.5) ("random" init, mamba_simple.py:90-94)
- dt_proj bias = softplus^-1 of LogUniform[dt_min, dt_max] (:98-108)
- A_log = log(1..d_state) per channel (S4D-real, :110-117)
- D = 1 (:121)
- in/out/x_proj: torch Linear kaiming-uniform defaults, no bias
- conv1d: torch Conv1d defaults (fan_in = width), with bias

Sequences are time-major (batch, L, d_model).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from segmamba_tpu.models.layers import torch_bias_uniform, torch_kaiming_uniform
from segmamba_tpu.ops.mamba_inner import mamba_inner


def _dt_bias_init(dt_min, dt_max, dt_init_floor):
    """Inverse-softplus of a log-uniform sample in [dt_min, dt_max]
    (mamba_simple.py:98-104)."""

    def init(key, shape, dtype=jnp.float32):
        u = jax.random.uniform(key, shape, jnp.float32)
        dt = jnp.exp(u * (math.log(dt_max) - math.log(dt_min)) + math.log(dt_min))
        dt = jnp.maximum(dt, dt_init_floor)
        # softplus^-1(dt) = dt + log(1 - exp(-dt))
        inv = dt + jnp.log(-jnp.expm1(-dt))
        return inv.astype(dtype)

    return init


def _a_log_init(d_state):
    """S4D-real: A = [1..d_state] per channel, stored as log (:111-117)."""

    def init(key, shape, dtype=jnp.float32):
        del key
        d_inner, n = shape
        a = jnp.tile(jnp.arange(1, n + 1, dtype=jnp.float32)[None], (d_inner, 1))
        return jnp.log(a).astype(dtype)

    return init


def slice_interleave(x, nslices):
    """Reorder a flattened (slice-major) sequence to position-major so a scan
    runs *across* slices: new[p*ns + s] = old[s*(L/ns) + p].

    Equivalent to the reference's chunk/stack/flatten on the length axis
    (mamba_simple.py:245-247). x: (batch, L, C)."""
    b, L, c = x.shape
    return x.reshape(b, nslices, L // nslices, c).swapaxes(1, 2).reshape(b, L, c)


def slice_deinterleave(x, nslices):
    """Inverse of ``slice_interleave`` (mamba_simple.py:261)."""
    b, L, c = x.shape
    return x.reshape(b, L // nslices, nslices, c).swapaxes(1, 2).reshape(b, L, c)


class MambaV3(nn.Module):
    """Tri-oriented selective-state-space mixer.

    Args mirror the reference ``Mamba(d_model, d_state, d_conv, expand,
    bimamba_type="v3", nslices)`` constructor (mamba_simple.py:34-55).
    """

    d_model: int
    d_state: int = 16
    d_conv: int = 4
    expand: int = 2
    dt_rank: int | None = None  # default: ceil(d_model / 16)
    dt_min: float = 0.001
    dt_max: float = 0.1
    dt_init_floor: float = 1e-4
    conv_bias: bool = True
    bias: bool = False
    bimamba_type: str = "v3"  # "v2" = fwd+flip only; "v3" adds inter-slice
    nslices: int | None = None
    scan_impl: str = "auto"
    scan_chunk: int = 128
    # opt-in zero-copy slice-order kernel for scan_impl="dir" (exact on
    # hardware but measured 12x slower than interleave+scan at stage-0;
    # see _run_directions_dir)
    slice_kernel: bool = False
    dtype: jnp.dtype = jnp.float32
    # sequence parallelism: when ``mesh`` is set, the inner op (conv + scan)
    # runs under shard_map with the token dim sharded over ``seq_axis``
    # (exact — carry/halo exchanged over ICI; a capability the reference
    # lacks, SURVEY.md §2.6). ``batch_axis`` composes with data parallelism.
    mesh: object = None
    seq_axis: str = "seq"
    batch_axis: str | None = None
    # tensor parallelism: when ``model_axis`` names an axis of ``mesh``, the
    # inner channel dim (d_inner) is sharded over it — parameters via
    # parallel/tp.py NamedShardings, activations via the constraints below;
    # GSPMD inserts the two matmul reductions (x_proj, out_proj). Use the
    # jnp scan cores (scan_impl="chunked"/"ref") with TP: a Pallas kernel is
    # a single-device program and would force operand gathers.
    model_axis: str | None = None

    def _direction_params(self, suffix, d_inner, dt_rank):
        """One parameter set (conv, x_proj, dt_proj, A_log, D) per direction,
        matching the reference's fwd/_b/_s triplicate (mamba_simple.py:111-181)."""
        conv_w = self.param(
            f"conv1d{suffix}_weight", torch_kaiming_uniform(self.d_conv),
            (self.d_conv, d_inner))
        conv_b = (
            self.param(f"conv1d{suffix}_bias", torch_bias_uniform(self.d_conv),
                       (d_inner,))
            if self.conv_bias else None)
        x_proj = self.param(
            f"x_proj{suffix}", torch_kaiming_uniform(d_inner),
            (d_inner, dt_rank + 2 * self.d_state))
        dt_init_std = dt_rank ** -0.5

        def dt_w_init(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -dt_init_std, dt_init_std)

        dt_proj = self.param(f"dt_proj{suffix}", dt_w_init, (dt_rank, d_inner))
        dt_bias = self.param(
            f"dt_proj{suffix}_bias",
            _dt_bias_init(self.dt_min, self.dt_max, self.dt_init_floor),
            (d_inner,))
        A_log = self.param(f"A{suffix}_log", _a_log_init(self.d_state),
                           (d_inner, self.d_state))
        D = self.param(f"D{suffix}", nn.initializers.ones, (d_inner,))
        return conv_w, conv_b, x_proj, dt_proj, dt_bias, A_log, D

    def _run_direction(self, xz, params, impl=None):
        conv_w, conv_b, x_proj, dt_proj, dt_bias, A_log, D = params
        A = -jnp.exp(A_log.astype(jnp.float32))
        return mamba_inner(
            xz, conv_w.astype(self.dtype),
            None if conv_b is None else conv_b.astype(self.dtype),
            x_proj.astype(self.dtype), dt_proj.astype(self.dtype),
            dt_bias.astype(jnp.float32), A, D.astype(jnp.float32),
            d_state=self.d_state, impl=impl or self.scan_impl,
            chunk_size=self.scan_chunk)

    def _run_direction_sharded(self, xz, params, reverse, batch_axis):
        from segmamba_tpu.ops.scan_sharded import mamba_inner_sharded

        conv_w, conv_b, x_proj, dt_proj, dt_bias, A_log, D = params
        A = -jnp.exp(A_log.astype(jnp.float32))
        return mamba_inner_sharded(
            xz, conv_w.astype(self.dtype),
            None if conv_b is None else conv_b.astype(self.dtype),
            x_proj.astype(self.dtype), dt_proj.astype(self.dtype),
            dt_bias.astype(jnp.float32), A, D.astype(jnp.float32),
            d_state=self.d_state, mesh=self.mesh, seq_axis=self.seq_axis,
            batch_axis=batch_axis, impl=self.scan_impl,
            chunk_size=self.scan_chunk, reverse=reverse)

    def _run_directions_batched(self, xz3, params3, batch):
        """All three orientations as ONE batched inner op: the direction
        index rides the batch dim, per-direction weights become per-batch
        kernel parameters (one fused scan launch instead of three; SURVEY.md
        §7.3's vmapped-direction design)."""
        from segmamba_tpu.ops.causal_conv1d import causal_conv1d_grouped
        from segmamba_tpu.ops.scan_pallas_fused import mamba_scan_fused

        conv_w3, conv_b3, x_proj3, dt_proj3, dt_bias3, A_log3, D3 = params3
        g = conv_w3.shape[0]
        d_inner = xz3.shape[-1] // 2
        dt_rank = x_proj3.shape[-1] - 2 * self.d_state
        x3, z3 = xz3[..., :d_inner], xz3[..., d_inner:]

        x3 = causal_conv1d_grouped(
            x3, conv_w3.astype(self.dtype),
            None if conv_b3 is None else conv_b3.astype(self.dtype),
            batch, activation="silu")
        # grouped projections: (g·b, L, Din) x (g, Din, E)
        L = x3.shape[1]
        xg = x3.reshape(g, batch, L, d_inner)
        x_dbl = jnp.einsum("gbld,gde->gble", xg, x_proj3.astype(x3.dtype))
        dt = jnp.einsum("gblr,grd->gbld", x_dbl[..., :dt_rank],
                        dt_proj3.astype(x3.dtype))
        Bm = x_dbl[..., dt_rank:dt_rank + self.d_state]
        Cm = x_dbl[..., dt_rank + self.d_state:]
        flat = lambda a: a.reshape(g * batch, L, a.shape[-1])

        A3 = -jnp.exp(A_log3.astype(jnp.float32))        # (g, Din, N)
        rep = lambda p: jnp.repeat(p, batch, axis=0)      # (g·b, ...)
        return mamba_scan_fused(
            x3, flat(dt), z3, rep(A3), flat(Bm), flat(Cm),
            rep(D3.astype(jnp.float32)), rep(dt_bias3.astype(jnp.float32)),
            chunk_size=self.scan_chunk)

    def _run_directions_proj(self, xz, psets, nslices):
        """Projection-fused chain (ops/scan_pallas_proj.py): per direction
        the scan kernel itself computes x_proj/dt_proj on the MXU and the
        three orientations CHAIN through an in-kernel accumulator — the
        slice and reverse orientations emit ungated partial sums, the
        forward orientation adds them and applies the shared silu(z) gate
        once. Per MambaLayer the large HBM traffic drops to: conv output
        read once per direction, z read once, output written once (the
        reference fuses the same ops into one autograd node,
        selective_scan_interface.py:155-224). Requires d_inner <= 128."""
        from segmamba_tpu.ops.causal_conv1d import causal_conv1d_directional
        from segmamba_tpu.ops.scan_pallas_proj import mamba_scan_proj

        use_slice = len(psets) == 3
        conv_w3 = jnp.stack([ps[0] for ps in psets])
        conv_b3 = (None if psets[0][1] is None
                   else jnp.stack([ps[1] for ps in psets]))
        d_inner = xz.shape[-1] // 2
        x, z = xz[..., :d_inner], xz[..., d_inner:]

        xc = causal_conv1d_directional(
            x, conv_w3.astype(self.dtype),
            None if conv_b3 is None else conv_b3.astype(self.dtype),
            activation="silu",
            nslices=nslices if use_slice else None)  # (g, b, L, d_inner)

        def run(g, xc_g, **kw):
            _, _, x_proj, dt_proj, dt_bias, A_log, D = psets[g]
            A = -jnp.exp(A_log.astype(jnp.float32))
            return mamba_scan_proj(
                xc_g, x_proj.astype(self.dtype), dt_proj.astype(self.dtype),
                dt_bias.astype(jnp.float32), A, D.astype(jnp.float32),
                chunk_size=self.scan_chunk, **kw)

        acc = None
        if use_slice:
            y_s = run(2, slice_interleave(xc[2], nslices))
            acc = slice_deinterleave(y_s, nslices)
        acc = run(1, xc[1], reverse=True, acc=acc)
        return run(0, xc[0], acc=acc, z=z)

    def _run_directions_dir2(self, xz, psets, batch, nslices):
        """Chained direction composition (ops/scan_pallas_dir2.py): the
        slice and reverse orientations emit ungated partials through the
        kernel's ``acc`` operand and the forward orientation applies the
        shared silu(z) gate once — z is read once per MambaLayer and the
        partial-output adds fuse into the kernels (VERDICT r4 item 1's
        realizable form; a single-walk two-carry kernel cannot carry both
        directions — see benchmarks/bench_dir2.py). Projections stay as
        XLA einsums (the in-kernel MXU form measured slower,
        scan_pallas_proj.py). Two rejected variants are recorded in
        bench_dir2.py: a (T, N, Dblk) time-leading kernel layout (slower
        despite cheaper shifts) and routing the SLICE orientation through
        the chain via interleaved xc/dt/B/C (slower than mamba_inner on
        interleaved xz) — so the slice orientation keeps the dir path's
        form, gated separately, and only rev->fwd chain."""
        from segmamba_tpu.ops.causal_conv1d import causal_conv1d_directional
        from segmamba_tpu.ops.scan_pallas_dir import mamba_scan_fused_dir

        use_slice = len(psets) == 3
        conv_w3, conv_b3, x_proj3, dt_proj3, dt_bias3, A_log3, D3 = tuple(
            None if ps[0] is None else jnp.stack(ps)
            for ps in zip(*psets[:2]))
        d_inner = xz.shape[-1] // 2
        dt_rank = x_proj3.shape[-1] - 2 * self.d_state
        x, z = xz[..., :d_inner], xz[..., d_inner:]

        xc = causal_conv1d_directional(
            x, conv_w3.astype(self.dtype),
            None if conv_b3 is None else conv_b3.astype(self.dtype),
            activation="silu")                           # (2, b, L, Din)
        x_dbl = jnp.einsum("gbld,gde->gble", xc, x_proj3.astype(xc.dtype))
        dt = jnp.einsum("gblr,grd->gbld", x_dbl[..., :dt_rank],
                        dt_proj3.astype(xc.dtype))
        Bm = x_dbl[..., dt_rank:dt_rank + self.d_state]
        Cm = x_dbl[..., dt_rank + self.d_state:]
        A3 = -jnp.exp(A_log3.astype(jnp.float32))       # (2, Din, N)
        D3f = D3.astype(jnp.float32)
        bias3f = dt_bias3.astype(jnp.float32)
        rep = lambda p, i: jnp.repeat(p[i:i + 1], batch, axis=0)

        def run(i, **kw):
            return mamba_scan_fused_dir(
                xc[i], dt[i], kw.pop("z", None), rep(A3, i), Bm[i], Cm[i],
                rep(D3f, i), rep(bias3f, i), chunk_size=self.scan_chunk,
                **kw)

        acc = run(1, reverse=True, gate=False)
        combined = run(0, acc=acc, z=z, gate=True)
        if use_slice:
            out_s = self._run_direction(
                slice_interleave(xz, nslices), psets[2], "fused")
            combined = combined + slice_deinterleave(out_s, nslices)
        return combined

    def _run_directions_dir(self, xz, psets, batch, nslices):
        """Forward + flip orientations over the ORIGINAL layout — no
        flip/concat copies: the conv handles direction algebraically
        (causal_conv1d_directional) and the scan kernel walks the chunks
        through reversed BlockSpec index maps (ops/scan_pallas_dir.py).
        The slice orientation reorders exactly ONE array (xz, before the
        conv) and reuses the plain fused pipeline — an earlier form
        interleaved the five post-conv arrays (xc/dt/z/B/C) instead and
        measured slower than the flip-and-batch path it was meant to
        replace."""
        from segmamba_tpu.ops.causal_conv1d import causal_conv1d_directional
        from segmamba_tpu.ops.scan_pallas_dir import (
            mamba_scan_fused_dir,
            mamba_scan_fused_slice,
            slice_scan_supported,
        )

        use_slice = len(psets) == 3
        L = xz.shape[1]
        # The zero-copy slice kernel (hardware-legal (S, Tp>=8, Dblk)
        # blocks, exact on-chip) LOSES to materializing the interleave:
        # its S-strided block DMA measured 59 ms vs 5.1 ms for
        # interleave+batched-scan at stage-0 (v5e, 262144x96). XLA's
        # gather copy is ~0.5 ms; strided DMA on every operand is not.
        # Default therefore interleaves; ``slice_kernel=True`` opts in.
        slice_in_kernel = (use_slice and self.slice_kernel
                           and slice_scan_supported(L, nslices,
                                                    self.scan_chunk))
        g = 3 if slice_in_kernel else 2
        conv_w3, conv_b3, x_proj3, dt_proj3, dt_bias3, A_log3, D3 = tuple(
            None if ps[0] is None else jnp.stack(ps)
            for ps in zip(*psets[:g]))
        d_inner = xz.shape[-1] // 2
        dt_rank = x_proj3.shape[-1] - 2 * self.d_state
        x, z = xz[..., :d_inner], xz[..., d_inner:]

        xc = causal_conv1d_directional(
            x, conv_w3.astype(self.dtype),
            None if conv_b3 is None else conv_b3.astype(self.dtype),
            activation="silu",
            nslices=nslices if slice_in_kernel else None)  # (g, b, L, Din)
        x_dbl = jnp.einsum("gbld,gde->gble", xc, x_proj3.astype(xc.dtype))
        dt = jnp.einsum("gblr,grd->gbld", x_dbl[..., :dt_rank],
                        dt_proj3.astype(xc.dtype))
        Bm = x_dbl[..., dt_rank:dt_rank + self.d_state]
        Cm = x_dbl[..., dt_rank + self.d_state:]
        A3 = -jnp.exp(A_log3.astype(jnp.float32))       # (g, Din, N)
        D3f = D3.astype(jnp.float32)
        bias3f = dt_bias3.astype(jnp.float32)
        rep = lambda p, g: jnp.repeat(p[g:g + 1], batch, axis=0)

        combined = mamba_scan_fused_dir(
            xc[0], dt[0], z, rep(A3, 0), Bm[0], Cm[0], rep(D3f, 0),
            rep(bias3f, 0), chunk_size=self.scan_chunk)
        combined = combined + mamba_scan_fused_dir(
            xc[1], dt[1], z, rep(A3, 1), Bm[1], Cm[1], rep(D3f, 1),
            rep(bias3f, 1), reverse=True, chunk_size=self.scan_chunk)

        if slice_in_kernel:
            combined = combined + mamba_scan_fused_slice(
                xc[2], dt[2], z, rep(A3, 2), Bm[2], Cm[2], rep(D3f, 2),
                rep(bias3f, 2), nslices=nslices,
                chunk_size=self.scan_chunk)
        elif use_slice:
            out_s = self._run_direction(
                slice_interleave(xz, nslices), psets[2], "fused")
            combined = combined + slice_deinterleave(out_s, nslices)
        return combined

    @nn.compact
    def __call__(self, hidden_states):
        """hidden_states: (batch, L, d_model) -> same shape."""
        if self.bimamba_type not in ("v2", "v3"):
            raise ValueError(f"bimamba_type={self.bimamba_type!r}; use "
                             "MambaUni for the uni-directional ('none') form")
        b, L, _ = hidden_states.shape
        d_inner = self.expand * self.d_model
        dt_rank = self.dt_rank or math.ceil(self.d_model / 16)
        nslices = self.nslices
        use_slice = self.bimamba_type == "v3"
        if use_slice and (nslices is None or L % nslices != 0):
            raise ValueError(f"nslices={nslices} must divide L={L}")

        h = hidden_states.astype(self.dtype)
        in_proj = self.param("in_proj", torch_kaiming_uniform(self.d_model),
                             (self.d_model, 2 * d_inner))
        xz = jnp.einsum("bld,de->ble", h, in_proj.astype(self.dtype))

        p_f = self._direction_params("", d_inner, dt_rank)
        p_b = self._direction_params("_b", d_inner, dt_rank)
        p_s = (self._direction_params("_s", d_inner, dt_rank)
               if use_slice else None)

        # SP only helps (and only works) when every shard holds at least a
        # conv window of tokens; tiny deep stages fall back to the local path
        use_sp = False
        sp_batch_axis = self.batch_axis
        use_tp = False
        if self.mesh is not None:
            axis_size = dict(zip(self.mesh.axis_names,
                                 self.mesh.devices.shape))
            n_seq = axis_size.get(self.seq_axis)
            use_sp = (n_seq is not None and L % n_seq == 0
                      and L // n_seq >= self.d_conv)
            # init/odd-batch traces: drop the batch axis when it doesn't
            # divide (the seq sharding alone is still exact)
            if (sp_batch_axis is not None
                    and b % axis_size.get(sp_batch_axis, 1) != 0):
                sp_batch_axis = None
            use_tp = (not use_sp and self.model_axis in axis_size
                      and d_inner % axis_size[self.model_axis] == 0)
        if use_tp:
            from jax.sharding import NamedSharding, PartitionSpec as TP_P

            _tp_act = lambda a: jax.lax.with_sharding_constraint(
                a, NamedSharding(self.mesh,
                                 TP_P(self.batch_axis, None,
                                      self.model_axis)))
            xz = _tp_act(xz)
        # TPU default: the CHAINED dir composition (scan_impl="dir2") —
        # zero-copy forward+flip with the reverse orientation's ungated
        # partial fed through the kernel's ``acc`` operand and the shared
        # silu(z) gate applied once; the slice orientation interleaves xz
        # once and is gated separately (routing it through the chain
        # measured slower, benchmarks/bench_dir2.py). A/B vs the unchained
        # dir path: 23.8 vs 25.1 ms stage0 fwd, 66.7 vs 67.6 fwd+bwd
        # (bench_dir2.py). ``scan_impl="dir"`` keeps the unchained form,
        # "fused" the flip-and-batch form (bench_dirpath.py).
        # ``scan_impl="proj"`` opts into the projection-fused chain
        # (scan_pallas_proj.py): exact, smaller backward footprint (no
        # (nd,R,N,L) dB/dC buffers), but measured 6% SLOWER than dir at
        # stage-0 — the scan is VPU-bound, so the in-kernel MXU projections
        # serialize onto the critical path (benchmarks/bench_proj.py).
        use_dirlike = not use_sp and not use_tp and (
            self.scan_impl in ("dir", "dir2", "proj")
            or (self.scan_impl in ("auto", "pallas")
                and jax.default_backend() == "tpu"))
        use_proj = False
        if use_dirlike and self.scan_impl == "proj":
            from segmamba_tpu.ops.scan_pallas_proj import proj_scan_supported

            use_proj = proj_scan_supported(d_inner)
        use_dir2 = (use_dirlike and not use_proj
                    and self.scan_impl in ("dir2", "auto", "pallas"))
        use_dir = use_dirlike and not use_proj and not use_dir2
        use_batched = (not use_sp and not use_dir and not use_proj
                       and not use_tp and self.scan_impl == "fused")
        if use_sp:
            # sequence-parallel path: the flip direction runs in-place as a
            # reversed sharded scan (no flipped copy crosses devices); the
            # slice direction's interleave is a jit-level resharding permute
            combined = self._run_direction_sharded(xz, p_f, False,
                                                   sp_batch_axis)
            combined = combined + self._run_direction_sharded(
                xz, p_b, True, sp_batch_axis)
            if use_slice:
                out_s = self._run_direction_sharded(
                    slice_interleave(xz, nslices), p_s, False, sp_batch_axis)
                combined = combined + slice_deinterleave(out_s, nslices)
        elif use_proj:
            psets = [p_f, p_b] + ([p_s] if use_slice else [])
            combined = self._run_directions_proj(xz, psets, nslices)
        elif use_dir2:
            psets = [p_f, p_b] + ([p_s] if use_slice else [])
            combined = self._run_directions_dir2(xz, psets, b, nslices)
        elif use_dir:
            psets = [p_f, p_b] + ([p_s] if use_slice else [])
            combined = self._run_directions_dir(xz, psets, b, nslices)
        elif use_batched:
            branches = [xz, jnp.flip(xz, axis=1)]
            psets = [p_f, p_b]
            if use_slice:
                branches.append(slice_interleave(xz, nslices))
                psets.append(p_s)
            xz3 = jnp.concatenate(branches, axis=0)
            params3 = tuple(
                None if ps[0] is None else jnp.stack(ps)
                for ps in zip(*psets))
            out3 = self._run_directions_batched(xz3, params3, b)
            out3 = out3.reshape(len(branches), b, L, d_inner)
            combined = out3[0] + jnp.flip(out3[1], axis=1)
            if use_slice:
                combined = combined + slice_deinterleave(out3[2], nslices)
        else:
            # under TP, keep to the GSPMD-shardable jnp cores (see tp.py)
            impl = ("chunked" if use_tp and self.scan_impl
                    in ("auto", "pallas", "fused", "dir") else None)
            out = self._run_direction(xz, p_f, impl)
            out_b = self._run_direction(jnp.flip(xz, axis=1), p_b, impl)
            combined = out + jnp.flip(out_b, axis=1)
            if use_slice:
                out_s = self._run_direction(slice_interleave(xz, nslices),
                                            p_s, impl)
                combined = combined + slice_deinterleave(out_s, nslices)

        if use_tp:
            combined = _tp_act(combined)
        out_proj = self.param("out_proj", torch_kaiming_uniform(d_inner),
                              (d_inner, self.d_model))
        y = jnp.einsum("bld,de->ble", combined, out_proj.astype(self.dtype))
        if self.bias:
            out_bias = self.param("out_proj_bias", torch_bias_uniform(d_inner),
                                  (self.d_model,))
            y = y + out_bias.astype(self.dtype)
        return y
