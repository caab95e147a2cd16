"""FLOP accounting + VPU roofline for the path tracer (MFU).

The megakernel is VPU work (elementwise intersection/shading math; the MXU
only runs the small gradient-routing matmuls), so the right roofline is
achieved f32 FLOP/s vs the chip's *vector-unit* peak — not the headline
MXU TFLOP/s, which only matmuls can reach.

Three instruments, all reported by benchmarks/mfu.py:

* `physics_cost_per_pixel` — a jaxpr-level census of `tile_physics`
  (kernels/megakernel.py), the exact jnp graph both the forward and
  backward kernels execute, per pixel-sample. This is a *counted* number
  (every primitive of the traced graph at XLA's per-op prices), not a
  hand estimate; transcendentals (sqrt/rsqrt of normalize) are reported
  separately because the VPU retires them at a fraction of FMA rate.
  (Rounds 1-3 used `Compiled.cost_analysis()` on an XLA:CPU build of the
  same graph — over-counted ~12x by CPU fusion duplication; see the
  census comment below.)
* `prng_flops_per_pixel` — analytic count of the draw-generation work the
  kernel does with `pltpu.prng_random_bits` (not visible to XLA because
  the cost model sees draws as inputs). Small; documented, not dominant.
* `measured_vpu_peak` — an FMA-chain Pallas microbenchmark: the highest
  f32 FLOP/s this chip's VPU reaches under the same timing methodology as
  the render benchmarks. MFU% is reported against this *measured* peak
  (and the FMA peak is itself the upper bound for select/compare-heavy
  code, so render MFU numbers are conservative).

Workload match: /root/reference/src/main.c:131-272 (pixel estimator) —
the FLOPs counted are the TPU translation of exactly that loop.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from ray_tracing_tpu.config import RenderConfig
from ray_tracing_tpu.ops.vec import Vec3


# ---------------------------------------------------------------------------
# Jaxpr-level flop census
# ---------------------------------------------------------------------------
#
# Round-4 finding: XLA:CPU's `Compiled.cost_analysis()` over-counts this
# workload ~12x. Its fusion pipeline freely DUPLICATES cheap producers into
# every consumer fusion (the optimized HLO of tile_physics at 10 bounces
# carries ~4,200 fusion-internal (8,128) parameters and ~39k arithmetic
# ops/px where the traced graph has ~3k), so "optimized-HLO flops" measures
# the CPU backend's rematerialization appetite, not the mathematical work
# the Mosaic-lowered kernel executes. The census below walks the JAXPR —
# backend-independent, duplication-free — with XLA's per-op prices
# (fma=mul+add=2, select=2, div=1, sqrt=1 flop + 1 transcendental,
# dot=2*M*N*K at one pass).

_FLOPS_1 = {
    "add", "sub", "mul", "div", "rem", "max", "min", "neg", "abs", "sign",
    "floor", "ceil", "round", "and", "or", "xor", "not", "eq", "ne", "lt",
    "le", "gt", "ge", "is_finite", "nextafter", "square",
}
_TRANSC = {
    "sqrt", "rsqrt", "exp", "exp2", "log", "log1p", "expm1", "sin", "cos",
    "tan", "asin", "acos", "atan", "atan2", "sinh", "cosh", "tanh",
    "logistic", "erf", "erfc", "erf_inv", "pow", "cbrt",
}
_REDUCES = {
    "reduce_sum", "reduce_max", "reduce_min", "reduce_prod", "reduce_and",
    "reduce_or", "argmax", "argmin", "cumsum", "cummax", "cummin",
    "cumprod", "reduce_precision",
}


def _aval_size(v) -> int:
    size = 1
    for d in getattr(v.aval, "shape", ()):
        size *= int(d)
    return size


def _dot_flops(eqn) -> float:
    (lc, _), (lb, _) = eqn.params["dimension_numbers"]
    lhs = eqn.invars[0].aval.shape
    k = 1
    for d in lc:
        k *= int(lhs[d])
    batch = 1
    for d in lb:
        batch *= int(lhs[d])
    out = _aval_size(eqn.outvars[0])
    return 2.0 * out * k  # out already includes batch dims


def _inner_jaxprs(eqn):
    """Sub-jaxprs of a higher-order eqn, with a repeat count."""
    p = eqn.params
    name = eqn.primitive.name
    if name == "scan":
        return [(p["jaxpr"], int(p["length"]))]
    if name == "while":
        return [(p["cond_jaxpr"], 1), (p["body_jaxpr"], 1)]  # ≥1 trip
    if name == "cond":
        return [(b, 1) for b in p["branches"]]  # upper bound: all branches
    for key in ("jaxpr", "call_jaxpr", "fun_jaxpr"):
        if key in p:
            return [(p[key], 1)]
    return []


def _jaxpr_cost(jaxpr) -> tuple[float, float]:
    """(flops, transcendentals) of a (Closed)Jaxpr, recursively."""
    if hasattr(jaxpr, "jaxpr"):
        jaxpr = jaxpr.jaxpr
    flops = 0.0
    transc = 0.0
    for eqn in jaxpr.eqns:
        inner = _inner_jaxprs(eqn)
        if inner:
            for sub, n in inner:
                f, t = _jaxpr_cost(sub)
                flops += n * f
                transc += n * t
            continue
        name = eqn.primitive.name
        if name == "dot_general":
            flops += _dot_flops(eqn)
        elif name in _FLOPS_1:
            flops += _aval_size(eqn.outvars[0])
        elif name in ("select_n", "clamp"):
            flops += 2 * _aval_size(eqn.outvars[0])
        elif name in _TRANSC:
            n = _aval_size(eqn.outvars[0])
            flops += n
            transc += n
        elif name == "integer_pow":
            y = abs(int(eqn.params["y"]))
            mults = max(y.bit_length() + bin(y).count("1") - 2, 1) if y > 1 else 1
            flops += mults * _aval_size(eqn.outvars[0])
        elif name in _REDUCES:
            flops += _aval_size(eqn.invars[0])
        # everything else (broadcast/reshape/convert/slice/concat/iota/
        # transpose/gather/scatter/dynamic_slice/bitcast/...) is layout or
        # memory movement: 0 flops, matching XLA's pricing.
    return flops, transc


def _traced_cost(fn, *args) -> dict:
    f, t = _jaxpr_cost(jax.make_jaxpr(fn)(*args))
    return {"flops": f, "transcendentals": t}


class _FixedDraws:
    """Draw provider over concrete input arrays, so cost analysis counts
    only the physics (draw generation is counted analytically)."""

    def __init__(self, shadow, direction, branch):
        self._shadow = shadow
        self._dir = direction
        self._branch = branch

    def shadow(self, b):
        return self._shadow[b]

    def direction(self, b):
        return self._dir[b]

    def branch(self, b):
        return self._branch[b]


@functools.lru_cache(maxsize=16)
def _physics_cost_cached(obj_type, light_index, emissive, config, tile):
    from ray_tracing_tpu.kernels.megakernel import SceneView, tile_physics

    th, tw = tile
    shape = (th, tw)
    ns = config.shadow_samples
    has_light = light_index >= 0
    n = len(obj_type)

    def vec(s):
        return Vec3(
            jnp.zeros(s, jnp.float32), jnp.zeros(s, jnp.float32),
            jnp.ones(s, jnp.float32),
        )

    draws = _FixedDraws(
        [vec((ns, th, tw)) for _ in range(config.bounces)] if has_light else [],
        [vec(shape) for _ in range(config.bounces)],
        [jnp.full(shape, 0.5) for _ in range(config.bounces)],
    )

    def f(rows, cam):
        view = SceneView(rows, obj_type, light_index, emissive)
        xs = jnp.broadcast_to(jnp.arange(tw, dtype=jnp.float32), shape)
        ys = jnp.broadcast_to(jnp.arange(th, dtype=jnp.float32)[:, None], shape)
        u, v = 1.0 - xs / (tw - 1), 1.0 - ys / (th - 1)
        return tile_physics(view, cam, u, v, draws, config, shape)

    rows = jnp.zeros((n, 16), jnp.float32)
    cam = jnp.zeros((16,), jnp.float32)
    cost = _traced_cost(f, rows, cam)
    px = th * tw
    return {
        "flops_per_px": cost["flops"] / px,
        "transcendentals_per_px": cost["transcendentals"] / px,
    }


def physics_cost_per_pixel(scene, config: RenderConfig, tile=(8, 128)):
    """XLA-counted cost of one pixel-sample of tile_physics for this scene
    topology (flops / transcendentals / bytes), per pixel."""
    return dict(
        _physics_cost_cached(
            scene.obj_type, scene.light_index,
            getattr(scene, "emissive", None), config, tile,
        )
    )


def prng_flops_per_pixel(config: RenderConfig, has_light: bool) -> float:
    """Analytic count of in-kernel draw generation (pltpu.prng_random_bits
    + uniform mapping + direction construction), per pixel-sample.

    Per uniform plane: shift + cast + scale ~ 3 ops (the PRNG core is a
    hardware unit, not VPU flops). Per random direction (cube-biased,
    src/vector.c:99-111): 3 uniforms (9) + 3 fma (6) + normalize
    (dot 5 + rsqrt ~1 + scale 3). Per bounce: 1 direction + 1 branch
    uniform (+ shadow_samples directions when the scene has a light)."""
    per_dir = 9 + 6 + 9
    per_branch = 3
    ns = config.shadow_samples if has_light else 0
    return config.bounces * ((1 + ns) * per_dir + per_branch)


# ---------------------------------------------------------------------------
# Measured VPU peak (FMA chains)
# ---------------------------------------------------------------------------

# One (8,128) f32 vreg-shaped block per chain: 8 chains fit the vector
# register file, so the fori body is pure ALU work with no VMEM streaming
# (a 256x256 block would round-trip VMEM every iteration and measure
# bandwidth, not the ALUs). The body is UNROLLED 64x inside the fori loop:
# the scalar loop (counter + compare + branch) otherwise rate-limits the
# vector pipe — measured on v5e, unroll 1 -> 64 raises the observed peak
# 3.1 -> 7.1 TFLOP/s (chains swept 4..32: 8 is best once unrolled; more
# chains spill vregs, fewer starve the FMA latency).
_PEAK_TILE = (8, 128)
_PEAK_CHAINS = 8
_PEAK_UNROLL = 64


def _peak_kernel(a_ref, o_ref, *, iters):
    assert iters % _PEAK_UNROLL == 0, (iters, _PEAK_UNROLL)
    a = a_ref[...]
    accs = [a + 0.01 * k for k in range(_PEAK_CHAINS)]

    def body(_, accs):
        # x <- x*x + a: ONE fma (2 flops) per element per chain per iter.
        # Quadratic in the carry and per-ELEMENT in `a` (a traced input
        # block, distinct per grid step), so neither constant folding nor
        # the affine strength-reduction that defeated an earlier x*c+k
        # version of this kernel can collapse the loop. _PEAK_UNROLL fma
        # steps per trip keep the scalar loop off the critical path.
        for _ in range(_PEAK_UNROLL):
            accs = tuple(x * x + a for x in accs)
        return accs

    accs = jax.lax.fori_loop(0, iters // _PEAK_UNROLL, body, tuple(accs))
    out = accs[0]
    for x in accs[1:]:
        out = out + x
    o_ref[...] = out


def measured_vpu_peak(grid: int = 512, iters: int = 16384) -> dict:
    """Achieved f32 FLOP/s of pure FMA chains on this chip's VPU.

    Double-marginal methodology (utils/timing.py): per-call time is a
    window difference with distinct inputs and last-output host
    materialization (immune to client-side result caching, to a
    non-blocking block_until_ready, and to fixed dispatch/fetch costs);
    per-ITERATION time is the difference between an `iters` and a
    `2*iters` kernel, cancelling pipeline/grid overhead inside the call.

    Returns {"flops_per_s", "ratio"}: ratio is the SECOND difference
    (t(4N)-t(2N)) / (t(2N)-t(N)), which must be ~2.0 — iters-doubling
    must double the marginal device time. A raw t(2N)/t(N) quotient was
    the round-3 check, but any additive per-call constant the window
    difference fails to cancel (the axon tunnel's dispatch floor is
    ~40 ms, 50x this kernel's device time at the old iters=256) drags it
    to ~1 even when the marginal is perfectly clean; the second
    difference cancels ANY additive constant by construction. A ratio
    far from 2 means the loop was folded away, the marginals drowned in
    noise, or the measurement never saw the execution — the result must
    not be trusted (the caller should gate on it).

    Default iters: the tunnel also rate-limits DISPATCH at ~25 ms/call
    (measured round 4), a floor even the window difference cannot remove
    — it is real steady-state cost. iters=16384 puts all three kernel
    sizes (N, 2N, 4N -> ~45/90/180 ms device) safely above that floor so
    the marginals are device-bound."""
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ray_tracing_tpu.utils.timing import timed_marginal

    th, tw = _PEAK_TILE

    def build(n_iters):
        call = pl.pallas_call(
            functools.partial(_peak_kernel, iters=n_iters),
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((th, tw), lambda i: (i, 0), memory_space=pltpu.VMEM)
            ],
            out_specs=pl.BlockSpec(
                (th, tw), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((grid * th, tw), jnp.float32),
        )

        @jax.jit
        def run(a):
            return jnp.sum(call(a))

        return run

    base = (
        jax.lax.broadcasted_iota(jnp.int32, (grid * th, tw), 0).astype(jnp.float32)
        * 1e-6
        + 0.25
    )
    base = jax.device_put(base)

    def make_args(i):
        a = base * (1.0 + 1e-6 * i)
        return (jax.block_until_ready(a),)

    runs = [build(m * iters) for m in (1, 2, 4)]
    for q, r in enumerate(runs):
        jax.block_until_ready(r(*make_args(-1 - q)))  # compile
    t_1, t_2, t_4 = (timed_marginal(r, make_args, repeats=3) for r in runs)

    elems = grid * th * tw
    marginal_flops = 2.0 * _PEAK_CHAINS * elems * iters  # (2N - N) iters
    return {
        "flops_per_s": marginal_flops / max(t_2 - t_1, 1e-12),
        # second difference: doubling iters must double the marginal
        "ratio": (t_4 - t_2) / max(t_2 - t_1, 1e-12),
    }


def measured_mxu_peak(n: int = 1024, iters: int = 4096) -> dict:
    """Achieved bf16 matmul FLOP/s of this chip's MXU (the ceiling the
    fetch/routing one-hot dots are measured against; VERDICT r04 #5).

    Same double-marginal + second-difference methodology as
    `measured_vpu_peak` (see its docstring): per-call time is a window
    difference with distinct inputs, per-ITERATION time is t(2N)-t(N),
    and the returned `ratio` = (t(4N)-t(2N))/(t(2N)-t(N)) must be ~2.0
    or the number is untrustworthy.

    The chain is x <- bf16(x @ a) with a traced `a`, accumulated in f32
    (preferred_element_type) — data-dependent, so XLA cannot fold the
    loop into a matrix power. 2*n^3 MAC-flops per iteration; at n=1024,
    iters=4096 the three kernels sit well above the ~25 ms tunnel
    dispatch floor. This measures the NATIVE bf16 pass rate; f32
    precision=HIGHEST dots consume 6 such passes
    (fetch_mxu_flops_per_pixel's passes=6 convention)."""
    from ray_tracing_tpu.utils.timing import timed_marginal

    def build(n_iters):
        @jax.jit
        def run(x0, a):
            def body(_, x):
                y = jax.lax.dot(x, a, preferred_element_type=jnp.float32)
                return y.astype(jnp.bfloat16)

            x = jax.lax.fori_loop(0, n_iters, body, x0)
            return jnp.sum(x.astype(jnp.float32))

        return run

    key = jax.random.key(7)
    ka, kx = jax.random.split(key)
    # spectral radius of N(0,1)/sqrt(n) is ~2; /2.2 keeps the chain from
    # blowing up while staying in bf16 normal range for the whole loop
    a = (jax.random.normal(ka, (n, n)) / (2.2 * n**0.5)).astype(jnp.bfloat16)
    x_base = jax.random.normal(kx, (n, n)).astype(jnp.bfloat16)
    a = jax.device_put(a)
    x_base = jax.device_put(x_base)

    def make_args(i):
        x = x_base * jnp.bfloat16(1.0 + 1e-3 * (i % 7))
        return (jax.block_until_ready(x), a)

    runs = [build(m * iters) for m in (1, 2, 4)]
    for q, r in enumerate(runs):
        jax.block_until_ready(r(*make_args(-1 - q)))  # compile
    t_1, t_2, t_4 = (timed_marginal(r, make_args, repeats=3) for r in runs)

    marginal_flops = 2.0 * n**3 * iters  # (2N - N) iters
    return {
        "flops_per_s": marginal_flops / max(t_2 - t_1, 1e-12),
        "ratio": (t_4 - t_2) / max(t_2 - t_1, 1e-12),
    }


def replay_vjp_cost_per_pixel(scene, config: RenderConfig, tile=(8, 128)):
    """Jaxpr-census cost of the path-replay backward's differentiable part:
    jax.vjp of tile_physics-with-ReplayTracer (forward replay + reverse
    sweep in one graph — what _bwd_kernel_replay executes after its
    recording pass). Per pixel. The recording pass itself costs
    `physics_cost_per_pixel` on top; the one-hot routing matmuls are MXU
    work, counted analytically by `routing_mxu_flops_per_pixel`."""
    from ray_tracing_tpu.kernels.megakernel import (
        RecordingTracer,
        ReplayTracer,
        tile_physics,
    )
    from ray_tracing_tpu.scene.types import OBJ_SPHERE

    th, tw = tile
    shape = (th, tw)
    ns = config.shadow_samples
    has_light = scene.has_light

    def vec(s):
        return Vec3(
            jnp.zeros(s, jnp.float32), jnp.zeros(s, jnp.float32),
            jnp.ones(s, jnp.float32),
        )

    draws = _FixedDraws(
        [vec((ns, th, tw)) for _ in range(config.bounces)] if has_light else [],
        [vec(shape) for _ in range(config.bounces)],
        [jnp.full(shape, 0.5) for _ in range(config.bounces)],
    )
    xs = jnp.broadcast_to(jnp.arange(tw, dtype=jnp.float32), shape)
    ys = jnp.broadcast_to(jnp.arange(th, dtype=jnp.float32)[:, None], shape)
    u, v = 1.0 - xs / (tw - 1), 1.0 - ys / (th - 1)
    cam = jnp.zeros((1, 16), jnp.float32)

    recorder = RecordingTracer(scene)
    tile_physics(scene, cam[0], u, v, draws, config, shape, tracer=recorder)
    records = recorder.records

    if has_light:
        li = int(scene.light_index)
        rows = scene.packed_rows()
        light_geom = (Vec3(*(rows[li, k] for k in range(3))),
                      Vec3(*(rows[li, k] for k in range(3, 6))))
        light_sph = bool(scene.obj_type[li] == OBJ_SPHERE)
    else:
        light_geom = None
        light_sph = False

    def g(records, cam_arr, light_geom):
        tracer = ReplayTracer(records, has_light, light_geom, light_sph)
        return tile_physics(None, cam_arr[0], u, v, draws, config, shape,
                            tracer=tracer)

    cots = tuple(jnp.ones(shape, jnp.float32) for _ in range(10))

    def h(records, cam_arr, light_geom, cots):
        _, vjpf = jax.vjp(g, records, cam_arr, light_geom)
        return vjpf(cots)

    cost = _traced_cost(h, records, cam, light_geom, cots)
    px = th * tw
    return {
        "flops_per_px": cost["flops"] / px,
        "transcendentals_per_px": cost["transcendentals"] / px,
    }


def fetch_vjp_cost_per_pixel(scene, config: RenderConfig, tile=(8, 128)):
    """Jaxpr-census cost of the FETCH backward's differentiable part:
    jax.vjp of tile_physics-with-FetchReplayTracer — what _bwd_kernel_fetch
    executes. Unlike the replay backward there is NO recording pass (the
    winner-index planes are residuals persisted by the forward kernel), so
    grad() runtime = fwd kernel + this. NOTE the count INCLUDES the one-hot
    fetch matmuls of the custom vjp (they live inside this graph); subtract
    `routing_mxu_flops_per_pixel` for a VPU-only roofline number."""
    from ray_tracing_tpu.kernels.megakernel import (
        FetchReplayTracer,
        IndexRecordingTracer,
        tile_physics,
    )

    th, tw = tile
    shape = (th, tw)
    ns = config.shadow_samples
    has_light = scene.has_light

    def vec(s):
        return Vec3(
            jnp.zeros(s, jnp.float32), jnp.zeros(s, jnp.float32),
            jnp.ones(s, jnp.float32),
        )

    draws = _FixedDraws(
        [vec((ns, th, tw)) for _ in range(config.bounces)] if has_light else [],
        [vec(shape) for _ in range(config.bounces)],
        [jnp.full(shape, 0.5) for _ in range(config.bounces)],
    )
    xs = jnp.broadcast_to(jnp.arange(tw, dtype=jnp.float32), shape)
    ys = jnp.broadcast_to(jnp.arange(th, dtype=jnp.float32)[:, None], shape)
    u, v = 1.0 - xs / (tw - 1), 1.0 - ys / (th - 1)
    cam = jnp.zeros((1, 16), jnp.float32)

    recorder = IndexRecordingTracer(scene)
    tile_physics(scene, cam[0], u, v, draws, config, shape, tracer=recorder)
    objs = recorder.objs
    rows = scene.packed_rows()
    li = int(scene.light_index) if has_light else -1

    def g(rows, cam_arr):
        tracer = FetchReplayTracer(objs, rows, scene.obj_type, li,
                                   emissive=getattr(scene, "emissive", None))
        return tile_physics(None, cam_arr[0], u, v, draws, config, shape,
                            tracer=tracer)

    cots = tuple(jnp.ones(shape, jnp.float32) for _ in range(10))

    def h(rows, cam_arr, cots):
        _, vjpf = jax.vjp(g, rows, cam_arr)
        return vjpf(cots)

    cost = _traced_cost(h, rows, cam, cots)
    px = th * tw
    return {
        "flops_per_px": cost["flops"] / px,
        "transcendentals_per_px": cost["transcendentals"] / px,
    }


def routing_mxu_flops_per_pixel(scene, config: RenderConfig) -> float:
    """One-hot routing matmuls (_route_record_grads) per pixel: for every
    record, dot_general((N,P),(16,P)) = 2*N*16 flops/pixel, x6 passes for
    precision=HIGHEST, plus the N-compare one-hot build (VPU). MXU work —
    reported separately from the VPU roofline."""
    n = scene.num_objects
    ns = config.shadow_samples if scene.has_light else 0
    n_records = config.bounces * (1 + ns)
    return n_records * 2.0 * n * 16 * 6


def fetch_mxu_flops_per_pixel(scene, config: RenderConfig,
                              passes: int = 1) -> float:
    """Dot flops of the FETCH backward's vjp graph — the one-hot
    dot_generals inside fetch_winner_cols' custom vjp, per pixel. Unlike
    the replay routing model above, shadow records fetch only the 3
    emission columns, and from a SINGLE row when the single-light
    occlusion collapse applies (trace_shadow_replay_fetch): subtracting
    the replay model instead would over-subtract ~2*N*13 flops per
    shadow record, clamp the VPU numerator to zero and destroy the
    reported bwd MFU.

    passes: XLA's cost analysis prices a dot at ONE pass regardless of
    precision (measured; see timing.py's methodology notes), so the
    default matches what fetch_vjp_cost_per_pixel counted and is the
    right value to SUBTRACT for a VPU-only numerator. On TPU hardware
    the precision=HIGHEST lowering runs 6 MXU passes — pass passes=6
    for an MXU-time estimate (the convention routing_mxu_flops_per_pixel
    uses)."""
    from ray_tracing_tpu.ops.intersect import _single_emissive_index

    n = scene.num_objects
    b = config.bounces
    mxu = b * 2.0 * n * 16  # primary trace fetches: (N,P)x(16,P)
    if scene.has_light:
        rows = 1 if _single_emissive_index(scene) is not None else n
        mxu += b * config.shadow_samples * 2.0 * rows * 3
    return mxu * passes


def rays_per_sample(width: int, height: int, config: RenderConfig) -> int:
    """The SURVEY §6 / bench.py ray-accounting model (bounces x (1 +
    shadow_samples) dispatches per pixel-sample). NOTE this is a *cost
    model*, not a trace count: lightless scenes (e.g. scene_2) skip NEE in
    both the reference (src/main.c:182) and our kernels, which is exactly
    why MFU below is accounted in counted FLOPs, not rays."""
    return width * height * config.bounces * (1 + config.shadow_samples)
