"""Auction-algorithm Earth Mover's Distance: Pallas TPU kernel + jnp reference.

TPU-native replacement for the reference CUDA extension ``metric/emd``
(emd_cuda.cu:23-282, emd_module.py:29-95). Same contract:

- inputs ``xyz1`` (pred) and ``xyz2`` (gt), shape (B, N, 3), same N, coords
  nominally normalized to [0, 1];
- ``earth_mover_distance(xyz1, xyz2, eps, iters) -> (dist, assignment)`` with
  per-point *squared* matched distances (B, N) and the int32 index of each
  pred point's matched gt point (B, N); the assignment is approximate and not
  guaranteed bijective (emd_module.py:16-19);
- gradient flows to ``xyz1`` only, as ``2*g*(x1 - x2[assignment])``
  (emd_cuda.cu:284-300; emd_module.py:79-87 returns zeros for xyz2).

Algorithm redesign for TPU. The CUDA version is built on data-dependent
compaction of unassigned points plus atomicMax/atomicAdd scatter across seven
kernels per iteration (emd_cuda.cu:256-267). None of that maps to TPU. This
implementation runs the *same auction* in a dense, masked, scatter-free form:

  each iteration, every still-unassigned point i bids for its best target
  column j* with increment (best - second_best + eps), where the bid value is
  ``3 - ||x1_i - x2_j|| - price_j`` (emd_cuda.cu:146). Winner resolution —
  CUDA's atomicMax on max_increments + GetMax index match — becomes a
  per-column max/argmax over the dense (N, N) bid matrix. Eviction — CUDA's
  assignment_inv bookkeeping — becomes a per-row predicate: a row is evicted
  iff the column it currently owns was won this iteration. On the final
  iteration all remaining bidders commit unconditionally, exactly like the
  CUDA ``last`` flag (emd_cuda.cu:196-215), guaranteeing a total assignment.

The loop exits early once every point is assigned (the CUDA driver keeps
launching no-op kernels instead, emd_cuda.cu:256). The Pallas kernel holds the
(N, N) value matrix and all auction state in VMEM and streams row-chunks
through the VPU, so per-iteration HBM traffic is zero.

Shape contract: ONE deterministic code path for every N <= 8192 on TPU.
Where the reference hard-errors on N % 1024 != 0 (emd_module.py:36-39), this
op pads odd N into the kernel with provably inert points (see
``_pad_to_chunk``): pad row k's unique best match is its own twin pad column
(mutual distance 0, >=99 units from any real point), so the pad sub-auction
commits fully in iteration 1 and real-row bids, prices, and assignments are
those of the dense auction at the real N. The XLA fallback remains only for
N > 8192 and non-TPU backends, with a loud once-per-shape warning.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fenet.ops.pairwise import pairwise_sqdist

_NEG = -1e9  # "minus infinity" for masked maxima (kept finite, like the CUDA code)
# Row-chunk processed per phase inside the Pallas kernel.
_CHUNK = 256
# Coordinate padding for MXU-friendly contractions.
_COORD_PAD = 8
# Up to this N the (N, N) value matrix lives in VMEM; beyond it the kernel
# streams value chunks recomputed from coordinates each iteration.
_MAX_N_IN_VMEM = 1024
# Streaming-mode ceiling (chunk temporaries + per-point vectors in VMEM).
_MAX_N_STREAMING = 8192
# Pad-point placement for odd-N inputs (see _pad_to_chunk): pads sit on a
# line x = _PAD_BASE + j (one unit apart) at y = z = _PAD_BASE. Chosen so
# (a) pad<->pad squared distances (j-j')^2 are computed exactly enough in
# fp32 via the aa + bb - 2ab contraction (coords <= ~355 keep the rounding
# error ~1e-2, far below the unit spacing), and (b) pad<->real distances are
# >= ~99 units for clouds within +/-20 of the origin (nominal data is in
# [0,1]), putting pad bid values ~170 below any real bid even after long
# price wars (price escalation is bounded by value range + n*eps ~ 55 at
# train settings).
_PAD_BASE = 100.0


# ---------------------------------------------------------------------------
# jnp reference (oracle + fallback)
# ---------------------------------------------------------------------------


def _auction_element(x1: jnp.ndarray, x2: jnp.ndarray, eps: float, iters: int,
                     scale_phases: int = 1, scale_factor: float = 5.0,
                     early_exit: bool = True, scale_thresh: float = 0.0):
    """Dense masked auction for a single (N, 3) pair.

    ``scale_phases > 1`` enables classic epsilon-scaling: run the auction at
    eps * factor^(P-1), ..., eps, resetting assignments between phases while
    carrying prices forward. The final phase uses the caller's eps, so the
    result keeps the same eps-optimality guarantee as the fixed-eps auction
    (the reference's mode, scale_phases=1) but converges in far fewer total
    iterations when clouds are far apart.

    ``scale_thresh > 0`` makes the scaling *adaptive*: the high-eps phases
    run only when the fraction of gt columns that are some pred point's
    nearest neighbor falls below the threshold. That fraction measures
    *competition* — the actual driver of auction cost. A clustered early-
    training prediction fighting over a few nearby targets scores ~0.005
    (price wars; scaling measured 1.6x faster at B=128/N=1024/train
    settings); independent overlapping clouds score ~0.6 and near-converged
    clouds ~0.97 (scaling measured 2-17x SLOWER there). Mean NN *distance*
    does not separate these regimes (0.06 vs 0.05 vs 0.016 measured) —
    competition does. When phases are skipped the result is exactly the
    fixed-eps auction's (prices start at 0, assignments empty).
    """
    n = x1.shape[0]
    value = 3.0 - jnp.sqrt(pairwise_sqdist(x1[None], x2[None])[0])  # (N, N)
    rows = jnp.arange(n, dtype=jnp.int32)
    cols = rows[None, :]
    adaptive = scale_phases > 1 and scale_thresh > 0.0
    if adaptive:
        nn_col = jnp.argmax(value, axis=1)  # each row's nearest gt column
        hit = jnp.zeros((n,), jnp.int32).at[nn_col].set(1)
        run_scaling = jnp.sum(hit) < scale_thresh * n
    else:
        run_scaling = None

    def run_phase(eps_p, force_last, price0, enabled=None):
        def cond(state):
            it, ass, _ = state
            if not early_exit:  # reference structure: all iters always run
                alive = it < iters
            else:
                alive = jnp.logical_and(it < iters, jnp.any(ass < 0))
            if enabled is not None:
                alive = jnp.logical_and(alive, enabled)
            return alive

        def body(state):
            it, ass, price = state
            last = jnp.logical_and(force_last, it == iters - 1)
            unass = ass < 0

            bids = value - price[None, :]
            best_col = jnp.argmax(bids, axis=1).astype(jnp.int32)
            best = jnp.max(bids, axis=1)
            better = jnp.max(
                jnp.where(cols == best_col[:, None], _NEG, bids), axis=1
            )
            inc = best - better + eps_p

            onehot = (cols == best_col[:, None]) & unass[:, None]
            w = jnp.where(onehot, inc[:, None], _NEG)
            winner_inc = jnp.max(w, axis=0)
            winner_row = jnp.argmax(w, axis=0).astype(jnp.int32)
            com_col = jnp.any(onehot, axis=0)

            commit = jnp.where(
                last, unass, unass & (winner_row[best_col] == rows)
            )
            evicted = (~last) & (ass >= 0) & com_col[jnp.clip(ass, 0)]
            ass = jnp.where(commit, best_col, jnp.where(evicted, -1, ass))
            price = jnp.where(
                last, price, price + jnp.where(com_col, winner_inc, 0.0)
            )
            return it + 1, ass, price

        _, ass, price = jax.lax.while_loop(
            cond,
            body,
            (jnp.int32(0), jnp.full((n,), -1, jnp.int32), price0),
        )
        return ass, price

    price = jnp.zeros((n,), jnp.float32)
    ass = jnp.full((n,), -1, jnp.int32)
    for p in range(scale_phases):
        eps_p = eps * (scale_factor ** (scale_phases - 1 - p))
        final = p == scale_phases - 1
        ass, price = run_phase(
            eps_p, final, price, None if final else run_scaling
        )
    dist = jnp.sum((x1 - x2[ass]) ** 2, axis=-1)
    return dist, ass


def earth_mover_distance_ref(
    xyz1: jnp.ndarray,
    xyz2: jnp.ndarray,
    eps: float = 0.005,
    iters: int = 50,
    scale_phases: int = 1,
    early_exit: bool = True,
    scale_thresh: float = 0.0,
):
    """Pure-XLA auction EMD. Same outputs as :func:`earth_mover_distance`."""
    fn = functools.partial(
        _auction_element, eps=eps, iters=iters, scale_phases=scale_phases,
        early_exit=early_exit, scale_thresh=scale_thresh,
    )
    return jax.vmap(fn)(xyz1.astype(jnp.float32), xyz2.astype(jnp.float32))


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------


def _emd_kernel(
    x1_ref,  # (1, N, CPAD) in VMEM
    x2_ref,  # (1, N, CPAD)
    dist_ref,  # (1, N, 1) out
    ass_out_ref,  # (1, N, 1) out int32
    value_ref,  # (N, N) scratch f32
    price_ref,  # (1, N) scratch f32
    ass_ref,  # (N, 1) scratch i32
    best_col_ref,  # (N, 1) scratch i32
    winner_inc_ref,  # (1, N) scratch f32
    winner_row_ref,  # (1, N) scratch i32
    com_col_ref,  # (1, N) scratch i32 (0/1)
    cnt_ref,  # (n_chunks,) SMEM scratch i32: unassigned rows per chunk
    *,
    n: int,
    n_real: int,
    eps: float,
    iters: int,
    store_value: bool = True,
    scale_phases: int = 1,
    scale_factor: float = 5.0,
    early_exit: bool = True,
    scale_thresh: float = 0.0,
):
    x1 = x1_ref[0]  # (N, CPAD)
    x2 = x2_ref[0]
    bb_all = jnp.sum(x2 * x2, axis=1, keepdims=True)  # (N, 1)

    def value_chunk(sl):
        """3 - ||x1[sl] - x2|| for a row chunk, computed in VMEM."""
        x1c = x1_ref[0, sl, :]
        aa = jnp.sum(x1c * x1c, axis=1, keepdims=True)
        ab = jax.lax.dot_general(
            x1c, x2, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        return 3.0 - jnp.sqrt(jnp.maximum(aa + bb_all.T - 2.0 * ab, 0.0))

    # --- init: auction state cleared; value matrix precomputed when it fits
    # in VMEM (N <= 1024), else streamed per chunk each iteration — the
    # "blockwise" mode that lifts the reference kernel's shared-memory size
    # ceiling (emd_cuda.cu:97) to N in the thousands.
    if store_value:
        value_ref[:, :] = value_chunk(pl.ds(0, n))
    price_ref[:, :] = jnp.zeros((1, n), jnp.float32)

    n_chunks = n // _CHUNK

    chunk_cols = jax.lax.broadcasted_iota(jnp.int32, (_CHUNK, n), 1)
    chunk_rows_local = jax.lax.broadcasted_iota(jnp.int32, (_CHUNK, 1), 0)

    # Adaptive epsilon-scaling decision: high-eps phases only pay off in the
    # high-competition regime (see _auction_element's docstring), so gate
    # them on the fraction of gt columns that are some pred row's nearest
    # neighbor — one argmax pass over the value matrix, accumulated as a
    # column-hit mask in com_col_ref (re-zeroed by every auction iteration
    # anyway). All intermediates stay 2-D/keepdims: lane-dim-reducing 1-D
    # vectors trip Mosaic relayout on this toolchain. When the gate is
    # closed the phase while-loops run zero iterations and the result is
    # bit-identical to the fixed-eps auction: prices are still zero and
    # assignments still empty when the final phase starts.
    if scale_phases > 1 and scale_thresh > 0.0:
        com_col_ref[:, :] = jnp.zeros((1, n), jnp.int32)
        for c in range(n_chunks):
            sl = pl.ds(c * _CHUNK, _CHUNK)
            vc = value_ref[sl, :] if store_value else value_chunk(sl)
            bc = jnp.argmax(vc, axis=1, keepdims=True).astype(jnp.int32)
            com_col_ref[:, :] = jnp.maximum(
                com_col_ref[0:1, :],
                jnp.max((chunk_cols == bc).astype(jnp.int32), axis=0,
                        keepdims=True),
            )
        hits = jnp.sum(com_col_ref[0:1, :].astype(jnp.float32))
        # Padded runs: every pad column is exactly its own twin row's NN
        # (value 3.0 vs <= 2.0 for neighbors) and no real row's NN is a pad
        # column, so hits == hits_real + n_pad — subtract the pad count and
        # threshold on the REAL N to keep the gate's semantics shape-
        # independent.
        run_scaling = hits - float(n - n_real) < scale_thresh * n_real
    else:
        run_scaling = None

    def make_iteration(eps_p, force_last):
      def iteration(state):
        it, _ = state
        last = jnp.logical_and(force_last, it == iters - 1)

        # Phases 1+2 fused: per-row best/second-best bids AND the per-column
        # winner among unassigned bidders, in ONE pass over the row chunks.
        # Winner resolution is a running max/argmax across chunks (strict
        # '>' keeps the first maximum, matching argmax-over-the-full-axis
        # semantics), and for chunk c it only needs chunk c's best_col/inc —
        # which are live in registers right after they're computed, so the
        # separate second pass (re-reading best_col/inc, rebuilding onehot)
        # is pure VMEM traffic saved.
        #
        # Chunks with zero unassigned rows (per-chunk counts maintained in
        # SMEM by phase 3) are skipped outright: the auction's long tail is
        # a price war among a handful of bidders, so after the first ~N/eps
        # wave most iterations touch one chunk, not n_chunks.
        winner_inc_ref[:, :] = jnp.full((1, n), _NEG, jnp.float32)
        winner_row_ref[:, :] = jnp.zeros((1, n), jnp.int32)
        com_col_ref[:, :] = jnp.zeros((1, n), jnp.int32)

        def phase12(c):
            @pl.when(cnt_ref[c] > 0)
            def _():
                sl = pl.ds(c * _CHUNK, _CHUNK)
                vc = value_ref[sl, :] if store_value else value_chunk(sl)
                bids = vc - price_ref[0:1, :]  # (CHUNK, N)
                best = jnp.max(bids, axis=1, keepdims=True)
                bc = jnp.argmax(bids, axis=1, keepdims=True).astype(jnp.int32)
                better = jnp.max(
                    jnp.where(chunk_cols == bc, _NEG, bids), axis=1,
                    keepdims=True,
                )
                inc = best - better + eps_p
                best_col_ref[sl, :] = bc  # phase 3 still reads this

                unass = ass_ref[sl, :] < 0  # (CHUNK, 1)
                onehot = (chunk_cols == bc) & unass
                w = jnp.where(onehot, inc, _NEG)  # (CHUNK, N)
                cmax = jnp.max(w, axis=0, keepdims=True)  # (1, N)
                carg = (
                    jnp.argmax(w, axis=0, keepdims=True).astype(jnp.int32)
                    + c * _CHUNK
                )
                upd = cmax > winner_inc_ref[0:1, :]
                winner_row_ref[:, :] = jnp.where(
                    upd, carg, winner_row_ref[0:1, :]
                )
                winner_inc_ref[:, :] = jnp.where(
                    upd, cmax, winner_inc_ref[0:1, :]
                )
                com_col_ref[:, :] = jnp.maximum(
                    com_col_ref[0:1, :],
                    jnp.max(onehot.astype(jnp.int32), axis=0, keepdims=True),
                )

        # Chunk loops are unrolled (n_chunks is static and small): a
        # fori_loop body is a sequential grind per trip, while unrolling
        # lets Mosaic software-pipeline the independent chunk passes.
        for c in range(n_chunks):
            phase12(c)

        # Phase 3: commit winners, evict previous owners of won columns.
        # Commit only matters in chunks that had unassigned bidders; for
        # fully-assigned chunks only the (cheaper) eviction test runs.
        def phase3(c):
            sl = pl.ds(c * _CHUNK, _CHUNK)
            ass = ass_ref[sl, :]  # (CHUNK, 1)
            owns = (chunk_cols == ass).astype(jnp.float32)  # -1 never matches
            col_won = (
                jnp.sum(owns * com_col_ref[0:1, :].astype(jnp.float32),
                        axis=1, keepdims=True) > 0
            )
            evicted = jnp.logical_and(jnp.logical_not(last), col_won)

            @pl.when(cnt_ref[c] > 0)
            def _():
                bc = best_col_ref[sl, :]
                unass = ass < 0
                onehot_f = ((chunk_cols == bc) & unass).astype(jnp.float32)
                wr_at_best = jnp.sum(
                    onehot_f * winner_row_ref[0:1, :].astype(jnp.float32),
                    axis=1,
                    keepdims=True,
                )  # (CHUNK, 1): winner_row gathered at each row's bid column
                rows_global = chunk_rows_local + c * _CHUNK
                won = wr_at_best == rows_global.astype(jnp.float32)
                # == unass if last else unass & won (Mosaic can't select
                # i1 vecs).
                commit = unass & jnp.logical_or(won, last)
                ass_ref[sl, :] = jnp.where(
                    commit, bc, jnp.where(evicted, -1, ass)
                )

            @pl.when(cnt_ref[c] == 0)
            def _():
                ass_ref[sl, :] = jnp.where(evicted, -1, ass)

            chunk_unass = jnp.sum((ass_ref[sl, :] < 0).astype(jnp.int32))
            cnt_ref[c] = chunk_unass
            return chunk_unass

        n_unass = jnp.int32(0)
        for c in range(n_chunks):
            n_unass = n_unass + phase3(c)

        # Price rise on won columns (skipped on the forced final iteration,
        # where prices are dead anyway — emd_cuda.cu:196-215).
        @pl.when(jnp.logical_not(last))
        def _():
            price_ref[:, :] = price_ref[0:1, :] + jnp.where(
                com_col_ref[0:1, :] > 0, winner_inc_ref[0:1, :], 0.0
            )

        return it + 1, n_unass
      return iteration

    for p in range(scale_phases):
        eps_p = eps * (scale_factor ** (scale_phases - 1 - p))
        final = p == scale_phases - 1
        ass_ref[:, :] = jnp.full((n, 1), -1, jnp.int32)
        for c in range(n_chunks):
            cnt_ref[c] = _CHUNK
        if early_exit:
            loop_cond = lambda s: jnp.logical_and(s[0] < iters, s[1] > 0)
        else:  # reference structure: the CUDA driver always runs all iters
            loop_cond = lambda s: s[0] < iters
        if not final and run_scaling is not None:
            loop_cond = lambda s, _c=loop_cond: jnp.logical_and(
                _c(s), run_scaling
            )
        jax.lax.while_loop(
            loop_cond,
            make_iteration(eps_p, final),
            (jnp.int32(0), jnp.int32(n)),
        )

    # Final matched distances via one-hot gather of x2 on the MXU.
    def finalize(c, _):
        sl = pl.ds(c * _CHUNK, _CHUNK)
        onehot = (chunk_cols == ass_ref[sl, :]).astype(jnp.float32)
        gathered = jax.lax.dot_general(
            onehot, x2, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (CHUNK, CPAD)
        diff = x1_ref[0, sl, :] - gathered
        dist_ref[0, sl, :] = jnp.sum(diff * diff, axis=1, keepdims=True)
        ass_out_ref[0, sl, :] = ass_ref[sl, :]
        return 0

    jax.lax.fori_loop(0, n_chunks, finalize, 0)


def _pad_to_chunk(xyz: jnp.ndarray, n: int) -> jnp.ndarray:
    """Append inert far-away pad points to reach the kernel's row-chunk
    multiple. Pad point j (same in both clouds) sits at
    ``(_PAD_BASE + j, _PAD_BASE, _PAD_BASE)``: its unique best match is its
    own twin (distance 0; nearest pad neighbor 1 unit, nearest real point
    ~99+ units away), so all pads self-assign in auction iteration 1 and
    never bid for — or lose — a real column. Real-row numerics are exactly
    the dense auction's at the real N; outputs are sliced back."""
    b, n_real, _ = xyz.shape
    j = jnp.arange(n - n_real, dtype=jnp.float32)
    pad = jnp.stack(
        [_PAD_BASE + j, jnp.full_like(j, _PAD_BASE),
         jnp.full_like(j, _PAD_BASE)], axis=-1,
    )
    return jnp.concatenate(
        [xyz, jnp.broadcast_to(pad, (b, n - n_real, 3))], axis=1
    )


@functools.partial(
    jax.jit,
    static_argnames=("eps", "iters", "scale_phases", "early_exit",
                     "scale_thresh", "interpret"),
)
def _emd_pallas(xyz1, xyz2, eps: float, iters: int, scale_phases: int = 1,
                early_exit: bool = True, scale_thresh: float = 0.0,
                interpret: bool = False):
    b, n_real, _ = xyz1.shape
    n = -(-n_real // _CHUNK) * _CHUNK
    if n != n_real:
        xyz1 = _pad_to_chunk(xyz1, n)
        xyz2 = _pad_to_chunk(xyz2, n)
    store_value = n <= _MAX_N_IN_VMEM
    x1 = jnp.pad(xyz1, ((0, 0), (0, 0), (0, _COORD_PAD - 3)))
    x2 = jnp.pad(xyz2, ((0, 0), (0, 0), (0, _COORD_PAD - 3)))
    dist, ass = pl.pallas_call(
        functools.partial(
            _emd_kernel, n=n, n_real=n_real, eps=eps, iters=iters,
            store_value=store_value,
            scale_phases=scale_phases, early_exit=early_exit,
            scale_thresh=scale_thresh,
        ),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, _COORD_PAD), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, _COORD_PAD), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, n, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, n, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((n, n) if store_value else (8, 128), jnp.float32),
            pltpu.VMEM((1, n), jnp.float32),
            pltpu.VMEM((n, 1), jnp.int32),
            pltpu.VMEM((n, 1), jnp.int32),
            pltpu.VMEM((1, n), jnp.float32),
            pltpu.VMEM((1, n), jnp.int32),
            pltpu.VMEM((1, n), jnp.int32),
            pltpu.SMEM((n // _CHUNK,), jnp.int32),
        ],
        interpret=interpret,
    )(x1, x2)
    return dist[:, :n_real, 0], ass[:, :n_real, 0]


def _use_pallas(n: int) -> bool:
    # Odd N is padded into the kernel (_pad_to_chunk): one deterministic
    # code path for every N <= the streaming ceiling.
    return jax.default_backend() == "tpu" and n <= _MAX_N_STREAMING


_warned_fallback: set = set()


def _warn_fallback_once(n: int) -> None:
    """Numerics change with implementation if the Pallas kernel declines
    (n > 8192, the streaming-mode VMEM ceiling) — say so once per shape on
    a TPU backend. (Odd N no longer falls back: it is padded in.)"""
    if n in _warned_fallback or jax.default_backend() != "tpu":
        return
    _warned_fallback.add(n)
    import logging

    logging.getLogger("fenet.ops.emd").warning(
        "EMD Pallas kernel declined for N=%d (needs N <= %d); falling back "
        "to the XLA reference auction (same algorithm, different "
        "tie-breaking/iteration microstructure).",
        n, _MAX_N_STREAMING,
    )


# ---------------------------------------------------------------------------
# Public op with custom VJP
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def earth_mover_distance(
    xyz1: jnp.ndarray,
    xyz2: jnp.ndarray,
    eps: float = 0.005,
    iters: int = 50,
    scale_phases: int = 1,
    early_exit: bool = True,
    scale_thresh: float = 0.0,
):
    """Approximate EMD matching via the auction algorithm.

    Args:
      xyz1: (B, N, 3) predicted cloud (gradient flows here only).
      xyz2: (B, N, 3) ground-truth cloud.
      eps: price-increment slack; larger converges faster but less accurately
        (train uses 0.05, eval 0.005 — loss/loss.py:23, utils/metrics.py:51).
      iters: max auction iterations (train 3000, eval 50). The loop exits as
        soon as the assignment is total.
      early_exit: True (default) stops the auction loop once the assignment
        is total; False reproduces the reference driver's structure, which
        always launches all ``iters`` iterations (emd_cuda.cu:256) — used by
        the bench.py reference-structured train baseline.
      scale_phases: 1 (default) = the reference's fixed-eps auction; >1 =
        classic epsilon-scaling — phases at eps*5^(P-1) ... eps with carried
        prices. Same final-eps optimality guarantee. Measured on v5e
        (B=32, N=1024, train settings): 2.6x faster when clouds are far
        apart (early training), ~1.8x slower when they already overlap —
        use with ``scale_thresh`` so the data decide per batch element.
      scale_thresh: 0 (default) = scaling phases always run when
        ``scale_phases > 1``. >0 = *adaptive* scaling: each element's
        high-eps phases run only if its nearest-neighbor competition
        statistic — the fraction of gt columns that are some pred point's
        nearest neighbor — is BELOW this threshold (low fraction = heavy
        column competition = long price wars = scaling wins; measured
        ~0.005 early-training vs ~0.6-0.97 for overlapping clouds, so 0.3
        separates the regimes). Skipped phases leave prices/assignments
        untouched, so the result is then bit-identical to the fixed-eps
        auction. Lets the training loss keep scaling on from epoch 1
        through convergence with no schedule to tune.

    Returns:
      ``(dist, assignment)``: (B, N) squared matched distances and (B, N)
      int32 gt indices, as in emd_module.py:16-19.
    """
    return _emd_fwd_impl(
        xyz1, xyz2, eps, iters, scale_phases, early_exit, scale_thresh
    )


def _emd_fwd_impl(xyz1, xyz2, eps, iters, scale_phases=1, early_exit=True,
                  scale_thresh=0.0):
    if xyz1.shape != xyz2.shape:
        raise ValueError(
            f"EMD requires same-size clouds, got {xyz1.shape} vs {xyz2.shape}"
        )
    xyz1 = xyz1.astype(jnp.float32)
    xyz2 = xyz2.astype(jnp.float32)
    if _use_pallas(xyz1.shape[1]):
        return _emd_pallas(
            xyz1, xyz2, eps, iters, scale_phases, early_exit, scale_thresh
        )
    _warn_fallback_once(xyz1.shape[1])
    return earth_mover_distance_ref(
        xyz1, xyz2, eps, iters, scale_phases, early_exit, scale_thresh
    )


def _emd_fwd(xyz1, xyz2, eps, iters, scale_phases, early_exit, scale_thresh):
    dist, ass = _emd_fwd_impl(
        xyz1, xyz2, eps, iters, scale_phases, early_exit, scale_thresh
    )
    return (dist, ass), (xyz1, xyz2, ass)


def _emd_bwd(eps, iters, scale_phases, early_exit, scale_thresh, res,
             cotangents):
    xyz1, xyz2, ass = res
    g, _ = cotangents
    bidx = jnp.arange(xyz1.shape[0])[:, None]
    # Gradient to xyz1 only (emd_cuda.cu:284-300, emd_module.py:83-87).
    dxyz1 = 2.0 * g[..., None] * (xyz1 - xyz2[bidx, ass])
    return dxyz1, jnp.zeros_like(xyz2)


earth_mover_distance.defvjp(_emd_fwd, _emd_bwd)
