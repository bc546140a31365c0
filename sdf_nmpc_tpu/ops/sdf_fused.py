"""Fused NeuralDF value + position-gradient Pallas TPU kernel.

The SQP hot loop needs, per shooting node and scenario, the truncated SDF
value AND its 3-gradient w.r.t. position (SURVEY.md hot loop 2 — the reference
pays an L4CasADi/libtorch round trip per node, gen_model.py:39).  This kernel
evaluates both in ONE pass using the stacked-tangent trick:

    rows = [primal; tangent_x; tangent_y; tangent_z]     (4*Bp, width)

so each linear layer is a single MXU matmul over the stacked rows and the
weights are read from VMEM exactly once per tile, with the activation
derivative taken from the primal rows:

    Z  = rows @ W             # one matmul for value + all 3 tangents
    H  = act(Z_p + b),  dH = act'(Z_p + b) * Z_t

Supports the NeuralDF architecture with res='full' (the mid-network residual
re-concat of [embeddings | latent] equals the original stacked input, so the
concat applies to primal and tangent rows alike).  The positional embedding
and its analytic tangent basis are precomputed in jnp (cheap, elementwise).

Falls back to `reference_value_and_grad` (plain jax.vmap(value_and_grad)) off
TPU; `fused_value_and_grad(..., interpret=True)` runs the kernel in the Pallas
interpreter for CPU tests.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..nn.embeddings import embedding_for


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def pack_neural_df_params(module, params) -> dict:
    """Extract + pad the NeuralDF dense weights for the kernel.

    Weight matrices are zero-padded to multiples of 128 on both axes (MXU
    lanes); zero pads are mathematically inert.  Returns a dict of jnp arrays
    plus layout metadata.
    """
    assert module.res == "full", "fused kernel supports res='full'"
    p = params["params"]
    embed_fn, nemb = embedding_for(module.embed, module.nb_freqs)
    L = module.size_latent
    in1 = nemb + L
    w1 = np.asarray(p["main1_0"]["kernel"])  # (in1, s0)
    s0 = w1.shape[1]
    w2 = np.asarray(p["main1_1"]["kernel"])
    s1 = w2.shape[1]
    w3 = np.asarray(p["main2_0"]["kernel"])  # (s1 + in1, s2)
    s2 = w3.shape[1]
    w4 = np.asarray(p["main2_1"]["kernel"])
    s3 = w4.shape[1]
    w5 = np.asarray(p["df"]["kernel"])  # (s3, 1)

    in1p = _round_up(in1, 128)
    s0p, s1p, s2p, s3p = (_round_up(s, 128) for s in (s0, s1, s2, s3))
    in3p = s1p + in1p  # concat in padded space: [H2 | X]

    def padw(w, rows, cols):
        out = np.zeros((rows, cols), np.float32)
        out[: w.shape[0], : w.shape[1]] = w
        return out

    # main2_0 consumes concat([h(s1), emb+latent(in1)]); in padded space the
    # second block starts at s1p, so scatter its rows accordingly
    w3p = np.zeros((in3p, s2p), np.float32)
    w3p[:s1, :s2] = w3[:s1]
    w3p[s1p : s1p + in1, :s2] = w3[s1:]

    def padb(b, cols):
        out = np.zeros((cols,), np.float32)
        out[: b.shape[0]] = b
        return out

    return dict(
        W1=jnp.asarray(padw(w1, in1p, s0p)),
        b1=jnp.asarray(padb(np.asarray(p["main1_0"]["bias"]), s0p)),
        W2=jnp.asarray(padw(w2, s0p, s1p)),
        b2=jnp.asarray(padb(np.asarray(p["main1_1"]["bias"]), s1p)),
        W3=jnp.asarray(w3p),
        b3=jnp.asarray(padb(np.asarray(p["main2_0"]["bias"]), s2p)),
        W4=jnp.asarray(padw(w4, s2p, s3p)),
        b4=jnp.asarray(padb(np.asarray(p["main2_1"]["bias"]), s3p)),
        W5=jnp.asarray(padw(w5, s3p, 128)),
        b5=jnp.asarray(padb(np.asarray(p["df"]["bias"]), 128)),
        meta=dict(in1=in1, in1p=in1p, s1p=s1p, in3p=in3p, nemb=nemb, L=L,
                  w0=float(module.w0), act=module.act),
        embed_fn=embed_fn,
    )


def _embed_with_tangents(embed_fn, pos):
    """(emb, demb): embedding value (B, nemb) and tangent basis (B, 3, nemb)."""
    B = pos.shape[0]
    if embed_fn is None:
        eye = jnp.broadcast_to(jnp.eye(3, dtype=pos.dtype), (B, 3, 3))
        return pos, eye

    from ..nn.embeddings import PositionEmbedding

    eye = jnp.broadcast_to(jnp.eye(3, dtype=pos.dtype), (B, 3, 3))
    if isinstance(embed_fn, PositionEmbedding):
        # analytic tangents: emb = [x, sin(xb), cos(xb)] with
        # xb = (x @ dirs) kron freqs, so d(emb)/dx_k = [e_k, cos(xb) J_k,
        # -sin(xb) J_k] with the CONSTANT J = dirs kron freqs — one sin+cos
        # evaluation shared by value and all three tangents, instead of the
        # nested-jvp form's four full passes with unfused intermediates
        dirs = jnp.asarray(embed_fn.dirs, pos.dtype)  # (3, nd)
        freqs = jnp.asarray(embed_fn.freq_bands, pos.dtype)  # (nf,)
        # precision pinned: this projection feeds sin(2^i * proj) — under the
        # TPU ambient DEFAULT the bf16 truncation of pos costs up to
        # 16*|pos|*2^-8 ~ 0.2 rad of phase, i.e. O(0.1) embedding error
        # (measured: 6e-2 value / 0.7 gradient error at production shapes
        # when a caller invokes the fused fn outside a precision context)
        proj = jnp.dot(pos, dirs, precision=jax.lax.Precision.HIGHEST)  # (B, nd)
        xb = (proj[..., None] * freqs).reshape(B, -1)  # (B, nd*nf)
        s, c = jnp.sin(xb), jnp.cos(xb)
        emb = jnp.concatenate([pos, s, c], axis=-1)
        J = (dirs[:, :, None] * freqs).reshape(3, -1)  # (3, nd*nf)
        demb = jnp.concatenate(
            [eye, c[:, None, :] * J[None], -s[:, None, :] * J[None]], axis=-1
        )
        return emb, demb

    def one(p):
        val, jac = jax.vmap(lambda t: jax.jvp(embed_fn, (p,), (t,)))(jnp.eye(3, dtype=p.dtype))
        return val[0], jac  # (nemb,), (3, nemb)

    return jax.vmap(one)(pos)


def _act_pair(z, act: str, w0: float):
    """(act(z), act'(z))."""
    if act == "sin":
        return jnp.sin(w0 * z), w0 * jnp.cos(w0 * z)
    if act == "relu":
        return jnp.maximum(z, 0.0), (z > 0).astype(z.dtype)
    if act == "softplus":
        return jax.nn.softplus(z), jax.nn.sigmoid(z)
    raise ValueError(act)


def _kernel(p_ref, t_ref, W1, b1, W2, b2, W3, b3, W4, b4, W5, b5,
            df_ref, gr_ref, *, bp, act, w0, in_dtype):
    """One tile: primal rows (bp, in1p) + tangent rows (3bp, in1p)."""

    # precision pinned: Mosaic only lowers DEFAULT/HIGHEST, so an ambient
    # jax.default_matmul_precision("high") context must not leak in here.
    # bf16 mode: operands truncated to bf16 (weights arrive bf16), f32
    # accumulation via preferred_element_type — one MXU pass per matmul
    # instead of HIGHEST's six; activations/biases stay f32.
    # mixed mode: primal (value) rows stay exact f32/HIGHEST, the three
    # tangent (gradient) row groups — 3/4 of the kernel's FLOPs — run one
    # bf16 MXU pass: the constraint VALUE drives feasibility, while bf16-
    # level error in its Jacobian is of the same nature as the one-iteration
    # stale linearization RTI already accepts (measured u0 impact in
    # docs/performance.md).
    _dot1 = partial(
        jnp.dot,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )
    _dot6 = partial(
        jnp.dot,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )

    def _dot3(Af, W):
        """bf16x3 emulation of an f32 matmul (XLA's HIGH, which Mosaic does
        not expose): split both operands into bf16 hi + bf16 residual and
        take the three leading cross terms — 3 MXU passes vs HIGHEST's 6,
        ~2^-21 relative error (the precision study shows the linearization
        region tolerates HIGH, docs/performance.md)."""
        Wf = W.astype(jnp.float32)
        Ah = Af.astype(jnp.bfloat16)
        Al = (Af - Ah.astype(jnp.float32)).astype(jnp.bfloat16)
        Wh = Wf.astype(jnp.bfloat16)
        Wl = (Wf - Wh.astype(jnp.float32)).astype(jnp.bfloat16)
        return _dot1(Ah, Wh) + (_dot1(Ah, Wl) + _dot1(Al, Wh))

    if in_dtype == "bf16":
        dot_p = dot_t = lambda A, W: _dot1(A.astype(jnp.bfloat16), W[:])
    elif in_dtype == "mixed":
        dot_p = lambda A, W: _dot6(A, W[:])
        dot_t = lambda A, W: _dot1(A.astype(jnp.bfloat16), W[:].astype(jnp.bfloat16))
    elif in_dtype == "f32x3":
        dot_p = dot_t = lambda A, W: _dot3(A, W[:])
    else:  # exact f32
        dot_p = dot_t = lambda A, W: _dot6(A, W[:])

    def dense_pair(P, T, W, b):
        zp = dot_p(P, W) + b[:]
        zt = dot_t(T, W)
        h, hp = _act_pair(zp, act, w0)
        hp3 = jnp.concatenate([hp, hp, hp], axis=0)  # broadcast act' to tangents
        return h, hp3 * zt

    P0 = p_ref[:]
    T0 = t_ref[:]
    H, T = dense_pair(P0, T0, W1, b1)
    H, T = dense_pair(H, T, W2, b2)
    # res='full' concat: [h | original input] for primal AND tangent rows
    H = jnp.concatenate([H, P0], axis=1)
    T = jnp.concatenate([T, T0], axis=1)
    H, T = dense_pair(H, T, W3, b3)
    H, T = dense_pair(H, T, W4, b4)
    df = dot_p(H, W5) + b5[:]
    dft = dot_t(T, W5)
    df_ref[:] = df[:, :128]
    # tangent rows are stacked [d/dx; d/dy; d/dz] blocks of bp rows
    gr_ref[:] = jnp.concatenate(
        [dft[0:bp, :1], dft[bp : 2 * bp, :1], dft[2 * bp : 3 * bp, :1]], axis=1
    )


def make_fused_sdf(module, params, tile: int = 256, interpret: bool = False,
                   dtype: str = "f32"):
    """Returns value_and_grad_fn(pos (B,3), latent (B,L)) -> (df (B,), grad (B,3)).

    One Pallas kernel pass computes values and position gradients for the whole
    batch (all scenarios x shooting nodes at once).

    dtype -- 'f32' (exact, matmuls at HIGHEST), 'mixed' (exact values,
    bf16 single-pass gradients — the tangent rows are 3/4 of the FLOPs), or
    'bf16' (weights + matmul
    operands bf16 with f32 accumulation: 1 MXU pass/matmul vs HIGHEST's 6;
    measured accuracy in docs/performance.md).
    """
    assert dtype in ("f32", "f32x3", "bf16", "mixed"), dtype
    in_dtype = dtype
    packed = pack_neural_df_params(module, params)
    meta = packed["meta"]
    embed_fn = packed["embed_fn"]
    in1, in1p = meta["in1"], meta["in1p"]
    nemb, L = meta["nemb"], meta["L"]

    weights = [packed[k] for k in ("W1", "b1", "W2", "b2", "W3", "b3", "W4", "b4", "W5", "b5")]
    if in_dtype == "bf16":
        # weight matrices carried in bf16 (halves their VMEM block); biases
        # stay f32 — they add into the f32 accumulator.  'mixed' keeps f32
        # weights (the primal rows need them) and casts per-use in kernel.
        weights = [w.astype(jnp.bfloat16) if w.ndim == 2 else w for w in weights]

    def value_and_grad(pos, latent):
        pos = jnp.asarray(pos, jnp.float32)
        latent = jnp.asarray(latent, jnp.float32)
        B = pos.shape[0]
        Bp = _round_up(max(B, 8), tile)
        n_tiles = Bp // tile

        emb, demb = _embed_with_tangents(embed_fn, pos)
        P = jnp.zeros((Bp, in1p), jnp.float32)
        P = P.at[:B, :nemb].set(emb).at[:B, nemb : nemb + L].set(latent)
        # tangent rows grouped per coordinate, tiled like the kernel expects:
        # rows [k*tile + i] within a tile hold d/dx_k of point i
        T = jnp.zeros((Bp, 3, in1p), jnp.float32)
        T = T.at[:B, :, :nemb].set(demb)
        # reorganize to per-tile stacked layout (n_tiles, 3*tile, in1p)
        T_tiles = T.reshape(n_tiles, tile, 3, in1p).transpose(0, 2, 1, 3).reshape(
            n_tiles, 3 * tile, in1p
        )
        T_stacked = T_tiles.reshape(n_tiles * 3 * tile, in1p)

        kern = partial(_kernel, bp=tile, act=meta["act"], w0=meta["w0"],
                       in_dtype=in_dtype)
        df_pad, gr_pad = pl.pallas_call(
            kern,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((tile, in1p), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((3 * tile, in1p), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ]
            + [
                pl.BlockSpec(w.shape, lambda i, n=w.ndim: (0,) * n, memory_space=pltpu.VMEM)
                for w in weights
            ],
            out_specs=[
                pl.BlockSpec((tile, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((Bp, 128), jnp.float32),
                jax.ShapeDtypeStruct((Bp, 3), jnp.float32),
            ],
            interpret=interpret,
        )(P, T_stacked, *weights)
        return df_pad[:B, 0], gr_pad[:B]

    return value_and_grad


def reference_value_and_grad(module, params):
    """Plain-jax oracle: vmapped value + jacfwd gradient (for tests/fallback)."""

    def scalar(pos, latent):
        return module.apply(params, jnp.concatenate([pos, latent]))[0]

    def fn(pos, latent):
        vals = jax.vmap(scalar)(pos, latent)
        grads = jax.vmap(jax.grad(scalar, argnums=0))(pos, latent)
        return vals, grads

    return fn


def make_fused_sdf_vg(module, params, tile: int = 256, interpret: bool = None,
                      dtype: str = "f32"):
    """Fused-kernel batched value+grad for the solver's constraint
    linearization (ocp.build_ocp `sdf_value_grad_batch`).

    The solver calls the batch function per scenario with (K=N, 3) positions
    and is then vmapped over thousands of scenarios; the custom_vmap rule
    flattens (B, K) into ONE kernel pass over B*K points so the MXU sees a
    single large stacked-tangent matmul per layer instead of B tiny ones.

    Returns None when the architecture is outside the kernel's support
    (res != 'full' or a non-4-layer trunk) — callers fall back to the
    jax.value_and_grad path.
    """
    if interpret is None:
        if jax.default_backend() != "tpu":
            return None  # interpreter mode is for tests only; use the AD path
        interpret = False
    p = params["params"]
    expected = {"main1_0", "main1_1", "main2_0", "main2_1", "df"}
    if module.res != "full" or not expected.issubset(p.keys()):
        return None
    fused = make_fused_sdf(module, params, tile=tile, interpret=interpret,
                           dtype=dtype)

    from jax import custom_batching

    @custom_batching.custom_vmap
    def vg(pos, latent):
        return fused(pos, latent)

    @vg.def_vmap
    def _rule(axis_size, in_batched, pos, latent):
        del axis_size, in_batched
        B, K = pos.shape[:2]
        vals, grads = fused(
            pos.reshape(B * K, 3), latent.reshape(B * K, latent.shape[-1])
        )
        return (vals.reshape(B, K), grads.reshape(B, K, 3)), (True, True)

    return vg
