"""Token sampling + the speculative acceptance rule, fully on-device.

Semantics match reference model/utils.py:27-34 (temperature < 1e-5 => argmax,
else softmax(logits/T) + multinomial) and the cumprod longest-prefix-match
acceptance of reference benchmark.py:162-165.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

GREEDY_TEMP_EPS = 1e-5


def sample(logits: jax.Array, temperature: float | jax.Array, key: jax.Array) -> jax.Array:
    """Sample token ids from ``logits`` [..., V].

    ``temperature`` may be a traced scalar; greedy and sampled branches are
    both computed and selected (cheap relative to the logits matmul).
    """
    logits = logits.astype(jnp.float32)
    greedy = jnp.argmax(logits, axis=-1)
    temp = jnp.maximum(jnp.asarray(temperature, jnp.float32), GREEDY_TEMP_EPS)
    sampled = jax.random.categorical(key, logits / temp, axis=-1)
    return jnp.where(jnp.asarray(temperature) < GREEDY_TEMP_EPS, greedy, sampled).astype(jnp.int32)


# Default static candidate-pool size for filtered sampling: top-k/top-p are
# resolved within the top-``pool`` logits (one EXACT approx_max_k partial
# reduce over the vocab — recall_target=1.0 runs the TPU PartialReduce with
# enough passes to be exact WITHOUT a full-vocab sort; exact lax.top_k was
# measured 3.2x slower end-to-end at 16 lanes, docs/RESULTS.md).  SEMANTICS:
# top_k <= pool is EXACT (the pool provably contains the true top-pool set,
# and the nucleus mass is normalized over the FULL vocab); requests with
# top_k > pool are rejected at the serving layer — no silent clamp.  The one
# residual approximation is top-p whose true nucleus extends past the pool
# (pool true-mass < p at high temperature): the nucleus truncates at the
# pool.  Deployments needing fatter tails configure a wider pool
# (EngineConfig.topk_pool / SpecEngine(topk_pool=...)): one executable per
# pool size, exact for any top_k <= pool.
TOPK_POOL = 64
# Candidate thresholds checked per filter in the exact path's one fused
# repair pass: resolves approx-pool misses of up to REPAIR_W-1 top-k
# elements (or nucleus-cut drift) without entering the bisection loop.
REPAIR_W = 8
# Probes per filter per refinement round (17-ary bracket narrowing): one
# fused kernel pass checks 2*REFINE_W thresholds, so the rare full-depth
# search over a ~2^27-bit bracket lands in ~6 rounds.
REFINE_W = 16


def filtered_logits_topk_topp(
    logits: jax.Array,  # [..., V] float32
    temp: jax.Array,  # scalar, >= GREEDY_TEMP_EPS
    top_k: jax.Array,
    top_p: jax.Array,
    pool: int,
) -> jax.Array:
    """Full-vocab logits with everything outside the joint top-k/top-p keep
    set masked to -inf — the exact filter a full-sort sampler applies, built
    from one approx candidate reduce + exact value thresholds
    (:func:`exact_filter_thresholds`).  ``pool`` is a PERFORMANCE knob only
    (a larger pool makes the threshold guess land without bisection for
    larger ``top_k``); the keep set is exact for any ``top_k`` regardless.

    Keep rule (HF/SGLang convention, reference benchmark_sglang.py:42-47):
    rank < top_k AND cumulative probability BEFORE the token < top_p, ranks
    and cumulative mass taken over the descending full-vocab distribution
    (top-p mass normalized over the FULL softmax, not the pool's).
    """
    V = logits.shape[-1]
    pool = min(pool, V)
    scaled = logits / temp
    cand_vals, _ = jax.lax.approx_max_k(scaled, pool, recall_target=0.95)
    cand_vals = -jnp.sort(-cand_vals, axis=-1)  # guaranteed descending
    keep = exact_filter_thresholds(scaled, top_k, top_p, cand_vals)
    return jnp.where(keep, scaled, -jnp.inf)


def _float_bits_ordered(x: jax.Array) -> jax.Array:
    """Map float32 to uint32 preserving total order (IEEE-754 trick:
    negative floats reverse, positives offset)."""
    b = jax.lax.bitcast_convert_type(x, jnp.int32)
    return jnp.where(b < 0, ~b, b ^ jnp.int32(-(2**31))).astype(jnp.uint32)


def _bits_to_float(u: jax.Array) -> jax.Array:
    """Inverse of :func:`_float_bits_ordered` (may produce NaN patterns for
    bit values that are not valid floats — callers guard those uses)."""
    ui = u.astype(jnp.int32)
    b = jnp.where(ui < 0, ui ^ jnp.int32(-(2 ** 31)), ~ui)
    return jax.lax.bitcast_convert_type(b, jnp.float32)


def exact_filter_thresholds(
    scaled: jax.Array,  # [..., V] float32 (already temperature-scaled)
    top_k: jax.Array,
    top_p: jax.Array,
    pool_vals: jax.Array,  # [..., P] descending (approx) candidate values
) -> jax.Array:
    """EXACT joint top-k/top-p keep mask as pure VALUE thresholds — no index
    sets, no scatter, no sort over the vocab (sort-based exact top-k costs
    58 ms on [256, 152k] f32 on v5e; approx_max_k(recall=1.0) costs 27 ms
    AND still misses — docs/RESULTS.md "Exact sampling filters").

    top-k: a bit-space threshold t reproduces the exact top-k set iff
    count(bits(scaled) >= t) == k (value ties straddling rank k keep ALL
    tied tokens — a full sort breaks such ties arbitrarily anyway).
    top-p: the nucleus {v : mass(scaled > scaled_v) < p} is likewise a bit
    threshold, valid iff mass(> t) < p <= mass(>= t), with the mass
    normalized over the FULL vocab softmax (the reference's semantics; a
    pool-local softmax over-keeps at high temperature).

    Search: one fused stats pass (kernels/filter_stats.py — counts + masses
    for 16 candidate thresholds in a single logits read) over candidates at
    pool ranks k-1..k-8 and around the pool's nucleus cut resolves the
    common case outright; unresolved rows 9-ary-refine a bit-space bracket,
    one stats pass per round (<= ~11 data-independent rounds; ~0 in
    practice when the candidates hit).

    Returns the boolean keep mask [..., V] (all-True where a filter is off).
    """
    from dflash_tpu.kernels.filter_stats import filter_stats

    V = scaled.shape[-1]
    P = pool_vals.shape[-1]
    W = min(REPAIR_W, P)
    lead = scaled.shape[:-1]
    x2 = scaled.reshape((-1, V))
    pool2 = pool_vals.reshape((-1, P))
    N = x2.shape[0]
    k = jnp.broadcast_to(jnp.asarray(top_k, jnp.int32), lead).reshape((N,))
    p = jnp.broadcast_to(jnp.asarray(top_p, jnp.float32), lead).reshape((N,))
    k_on = (k > 0) & (k < V)
    p_on = p < 1.0
    UMAX = jnp.uint32(0xFFFFFFFF)

    # -- candidate thresholds -------------------------------------------------
    kk = jnp.clip(k, 1, min(P, V)) - 1
    ranks_k = jnp.clip(kk[:, None] - jnp.arange(W), 0, P - 1)  # [N, W]
    # nucleus-cut guess from a pool-local softmax (seeds only; correctness
    # comes from the verified full-vocab masses below)
    pool_sm = jax.nn.softmax(pool2, axis=-1)
    cum_before = jnp.cumsum(pool_sm, axis=-1) - pool_sm
    cut = jnp.sum((cum_before < p[:, None]).astype(jnp.int32), axis=-1) - 1
    ranks_p = jnp.clip(cut[:, None] - jnp.arange(W), 0, P - 1)
    thr_vals = jnp.take_along_axis(
        pool2, jnp.concatenate([ranks_k, ranks_p], axis=-1), axis=-1
    )  # [N, 2W] — ranks descend within each group => values ASCEND
    tb = _float_bits_ordered(thr_vals)
    c_ge, c_gt, m_gt, lse, row_min = filter_stats(x2, tb, 2 * W)
    # "below everything" bit threshold: count(>= it) = V, mass(> it) = 1 —
    # the always-valid lower bracket end (tighter than bit 0)
    floor_bits = _float_bits_ordered(row_min) - 1
    m_eq = jnp.where(
        c_ge > c_gt,
        jnp.exp(thr_vals - lse[:, None]) * (c_ge - c_gt).astype(jnp.float32),
        0.0,
    )
    m_ge = m_gt + m_eq

    # -- top-k: a candidate that separates rank k (or tie-straddles it) ------
    good_k = (c_ge[:, :W] == k[:, None]) | (
        (c_gt[:, :W] < k[:, None]) & (k[:, None] < c_ge[:, :W])
    )
    any_k = jnp.any(good_k, axis=-1)
    kbits0 = jnp.take_along_axis(
        tb[:, :W], jnp.argmax(good_k, axis=-1)[:, None], axis=-1
    )[:, 0]
    # bracket for unresolved rows: candidates ascend in value, counts
    # non-increasing -> the ok-region (count >= k) is a PREFIX
    ok_k = c_ge[:, :W] >= k[:, None]
    n_ok = jnp.sum(ok_k.astype(jnp.int32), axis=-1)
    klo = jnp.where(
        n_ok > 0,
        jnp.take_along_axis(
            tb[:, :W], jnp.clip(n_ok - 1, 0, W - 1)[:, None], axis=-1
        )[:, 0],
        floor_bits,
    )
    klo_c = jnp.where(
        n_ok > 0,
        jnp.take_along_axis(
            c_ge[:, :W], jnp.clip(n_ok - 1, 0, W - 1)[:, None], axis=-1
        )[:, 0],
        jnp.int32(V),
    )
    khi = jnp.where(
        n_ok < W,
        jnp.take_along_axis(
            tb[:, :W], jnp.clip(n_ok, 0, W - 1)[:, None], axis=-1
        )[:, 0],
        UMAX,
    )
    k_res = any_k | (~k_on)

    # -- top-p: a candidate with mass(>t) < p <= mass(>=t) -------------------
    good_p = (m_gt[:, W:] < p[:, None]) & (m_ge[:, W:] >= p[:, None])
    any_p = jnp.any(good_p, axis=-1)
    pbits0 = jnp.take_along_axis(
        tb[:, W:], jnp.argmax(good_p, axis=-1)[:, None], axis=-1
    )[:, 0]
    # candidates ascend; mass_gt non-increasing -> (mass_gt >= p) is a prefix
    ok_p = m_gt[:, W:] >= p[:, None]
    n_okp = jnp.sum(ok_p.astype(jnp.int32), axis=-1)
    plo = jnp.where(
        n_okp > 0,
        jnp.take_along_axis(
            tb[:, W:], jnp.clip(n_okp - 1, 0, W - 1)[:, None], axis=-1
        )[:, 0],
        floor_bits,
    )
    phi = jnp.where(
        n_okp < W,
        jnp.take_along_axis(
            tb[:, W:], jnp.clip(n_okp, 0, W - 1)[:, None], axis=-1
        )[:, 0],
        UMAX,
    )
    phi_mgt = jnp.where(
        n_okp < W,
        jnp.take_along_axis(
            m_gt[:, W:], jnp.clip(n_okp, 0, W - 1)[:, None], axis=-1
        )[:, 0],
        jnp.float32(0.0),
    )
    phi_mge = jnp.where(
        n_okp < W,
        jnp.take_along_axis(
            m_ge[:, W:], jnp.clip(n_okp, 0, W - 1)[:, None], axis=-1
        )[:, 0],
        jnp.float32(0.0),
    )
    p_res = any_p | (~p_on)

    # -- 17-ary refinement: one fused stats pass per round --------------------
    RW = REFINE_W

    def probes_of(lo, hi):
        """REFINE_W strictly-increasing probes inside (lo, hi]."""
        width = hi - lo
        step = jnp.maximum(width // (RW + 1), 1)
        j = jnp.arange(1, RW + 1, dtype=jnp.uint32)
        return jnp.minimum(lo[:, None] + step[:, None] * j[None, :], hi[:, None])

    def cond(c):
        (k_res, klo, khi, klo_c, kbits,
         p_res, plo, phi, phi_mgt, phi_mge, pbits, it) = c
        k_open = ~k_res & (khi - klo > 1) & (klo_c != k)
        p_open = ~p_res & (phi - plo > 1)
        return jnp.any(k_open | p_open) & (it < 16)

    def body(c):
        (k_res, klo, khi, klo_c, kbits,
         p_res, plo, phi, phi_mgt, phi_mge, pbits, it) = c
        kpr = probes_of(klo, khi)  # [N, RW] ascending
        ppr = probes_of(plo, phi)
        cg, cgt_, mg, _lse, _rm = filter_stats(
            x2, jnp.concatenate([kpr, ppr], axis=-1), 2 * RW
        )
        cgk, cgtk = cg[:, :RW], cgt_[:, :RW]
        mgp = mg[:, RW:]
        # probe values for tie-mass at p probes (guarded: NaN only when no
        # element equals the probe, and then the factor is 0)
        pvals = _bits_to_float(ppr)
        meqp = jnp.where(
            cg[:, RW:] > cgt_[:, RW:],
            jnp.exp(pvals - lse[:, None])
            * (cg[:, RW:] - cgt_[:, RW:]).astype(jnp.float32),
            0.0,
        )
        mgep = mgp + meqp
        # k: exact/tie probe?
        gk = (cgk == k[:, None]) | ((cgtk < k[:, None]) & (k[:, None] < cgk))
        hit_k = jnp.any(gk, axis=-1)
        kb_new = jnp.take_along_axis(
            kpr, jnp.argmax(gk, axis=-1)[:, None], axis=-1
        )[:, 0]
        # narrow: ok (count >= k) is a prefix of the ascending probes
        okk = cgk >= k[:, None]
        nk = jnp.sum(okk.astype(jnp.int32), axis=-1)
        klo2 = jnp.where(
            nk > 0,
            jnp.take_along_axis(kpr, jnp.clip(nk - 1, 0, RW - 1)[:, None],
                                axis=-1)[:, 0],
            klo,
        )
        klo_c2 = jnp.where(
            nk > 0,
            jnp.take_along_axis(cgk, jnp.clip(nk - 1, 0, RW - 1)[:, None],
                                axis=-1)[:, 0],
            klo_c,
        )
        khi2 = jnp.where(
            nk < RW,
            jnp.take_along_axis(kpr, jnp.clip(nk, 0, RW - 1)[:, None],
                                axis=-1)[:, 0],
            khi,
        )
        k_act = ~k_res
        kbits = jnp.where(k_act & hit_k, kb_new, kbits)
        k_res = k_res | hit_k
        klo = jnp.where(k_act, klo2, klo)
        klo_c = jnp.where(k_act, klo_c2, klo_c)
        khi = jnp.where(k_act, khi2, khi)
        # p: valid probe?
        gp = (mgp < p[:, None]) & (mgep >= p[:, None])
        hit_p = jnp.any(gp, axis=-1)
        pb_new = jnp.take_along_axis(
            ppr, jnp.argmax(gp, axis=-1)[:, None], axis=-1
        )[:, 0]
        okp = mgp >= p[:, None]
        np_ = jnp.sum(okp.astype(jnp.int32), axis=-1)
        plo2 = jnp.where(
            np_ > 0,
            jnp.take_along_axis(ppr, jnp.clip(np_ - 1, 0, RW - 1)[:, None],
                                axis=-1)[:, 0],
            plo,
        )
        phi2 = jnp.where(
            np_ < RW,
            jnp.take_along_axis(ppr, jnp.clip(np_, 0, RW - 1)[:, None],
                                axis=-1)[:, 0],
            phi,
        )
        phi_mgt2 = jnp.where(
            np_ < RW,
            jnp.take_along_axis(mgp, jnp.clip(np_, 0, RW - 1)[:, None],
                                axis=-1)[:, 0],
            phi_mgt,
        )
        phi_mge2 = jnp.where(
            np_ < RW,
            jnp.take_along_axis(mgep, jnp.clip(np_, 0, RW - 1)[:, None],
                                axis=-1)[:, 0],
            phi_mge,
        )
        p_act = ~p_res
        pbits = jnp.where(p_act & hit_p, pb_new, pbits)
        p_res = p_res | hit_p
        plo = jnp.where(p_act, plo2, plo)
        phi = jnp.where(p_act, phi2, phi)
        phi_mgt = jnp.where(p_act, phi_mgt2, phi_mgt)
        phi_mge = jnp.where(p_act, phi_mge2, phi_mge)
        return (k_res, klo, khi, klo_c, kbits,
                p_res, plo, phi, phi_mgt, phi_mge, pbits, it + 1)

    (k_res, klo, khi, klo_c, kbits,
     p_res, plo, phi, phi_mgt, phi_mge, pbits, _) = jax.lax.while_loop(
        cond, body,
        (k_res, klo, khi, klo_c, kbits0,
         p_res, plo, phi, phi_mgt, phi_mge, pbits0, jnp.int32(0)),
    )
    # unresolved leftovers collapsed to width <= 1: keep-all-ties at lo /
    # minimal set at hi (boundary semantics, see docstring)
    kbits = jnp.where(k_res, kbits, klo)
    pbits = jnp.where(p_res, pbits, phi)

    u = _float_bits_ordered(x2)
    keep = jnp.where(k_on[:, None], u >= kbits[:, None], True) & jnp.where(
        p_on[:, None], u >= pbits[:, None], True
    )
    return keep.reshape(scaled.shape)


def sample_topk_topp(
    logits: jax.Array,
    temperature: float | jax.Array,
    key: jax.Array,
    top_k: jax.Array,
    top_p: jax.Array,
    pool: int = TOPK_POOL,
) -> jax.Array:
    """``sample`` with per-call traced top-k / top-p filtering.

    Serving-parity sampler (the reference's SGLang client sends
    ``sampling_params = {temperature, top_p, top_k}`` per request, reference
    benchmark_sglang.py:42-47); filters follow the HF/SGLang convention:
    temperature scaling first, then top-k (keep the k highest logits;
    ``top_k <= 0`` disables), then top-p (keep the smallest prefix of the
    descending distribution with cumulative probability >= ``top_p``;
    ``top_p >= 1`` disables), then categorical sampling over the masked
    FULL-VOCAB logits.  ``temperature`` below the greedy epsilon returns
    argmax regardless of filters.  When both filters are no-ops the result
    matches unfiltered :func:`sample` bit-for-bit; when active, the keep set
    is EXACT (tests pin it against a full-sort sampler for top_k up to the
    vocab) and the sample is bit-identical to a full-sort sampler applying
    the same keep rule over the same masked logits with the same key.
    """
    logits = logits.astype(jnp.float32)
    greedy = jnp.argmax(logits, axis=-1)
    temp = jnp.maximum(jnp.asarray(temperature, jnp.float32), GREEDY_TEMP_EPS)
    k = jnp.asarray(top_k, jnp.int32)
    p = jnp.asarray(top_p, jnp.float32)
    active = ((k > 0) & (k < logits.shape[-1])) | (p < 1.0)
    masked = filtered_logits_topk_topp(logits, temp, k, p, pool)
    final = jnp.where(active, masked, logits / temp)
    out = jax.random.categorical(key, final, axis=-1)
    return jnp.where(
        jnp.asarray(temperature) < GREEDY_TEMP_EPS, greedy, out
    ).astype(jnp.int32)


def topk_desc(x: jax.Array, n: int) -> tuple[jax.Array, jax.Array]:
    """Exact top-``n`` (values, indices) of ``x`` [..., V] in descending
    order — ``n`` sequential argmax passes instead of a sort.

    Bit-identical to ``jax.lax.top_k`` including tie order (argmax returns
    the lowest index of the maximum; masking it out makes the next pass
    return the next-lowest, which is exactly lax.top_k's stable tie-break).
    For the small static ``n`` of the candidate builders (rank_top_k <= 8)
    this is n linear passes over the row — the TPU sort that lax.top_k
    lowers to was measured as the dominant candidate-cycle overhead at a
    151k vocab (docs/RESULTS.md "Exact sampling filters" pins the same
    lesson for the sampler).
    """
    x = x.astype(jnp.float32)
    V = x.shape[-1]
    n = min(n, V)
    iota = jnp.arange(V, dtype=jnp.int32)
    vals, idxs = [], []
    for _ in range(n):
        i = jnp.argmax(x, axis=-1)
        v = jnp.take_along_axis(x, i[..., None], axis=-1)[..., 0]
        vals.append(v)
        idxs.append(i.astype(jnp.int32))
        x = jnp.where(iota == i[..., None], -jnp.inf, x)
    return jnp.stack(vals, axis=-1), jnp.stack(idxs, axis=-1)


def acceptance_length(draft_tokens: jax.Array, posterior: jax.Array) -> jax.Array:
    """Longest accepted prefix length.

    ``draft_tokens`` [B, S-1] are the drafted tokens for block positions
    1..S-1; ``posterior`` [B, S] are the target's (greedy/sampled) tokens for
    all S block positions.  Returns [B] int32: the number of draft tokens
    matching ``posterior[:-1]`` as a prefix (reference benchmark.py:163):
    ``(draft == posterior[:, :-1]).cumprod(axis=1).sum(axis=1)``.
    """
    matches = (draft_tokens == posterior[..., :-1]).astype(jnp.int32)
    return jnp.cumprod(matches, axis=-1).sum(axis=-1)
