"""In-kernel counter-based dropout bits (ops/pallas/fused_block.py
_seed_bits).

The fused lane kernels accept a SCALAR int32 seed in place of the
materialized [Cin, N] uint8 bits tensor and reconstruct the dropout mask
on the VPU from a murmur3-finalizer hash of each element's global index.
The contract under test:

1. the kernel bit stream equals a host numpy mirror of the hash — so
   seed mode is bit-identical to array mode fed with the mirrored bits
   (values AND gradients, bf16 and int8 paths);
2. the mask is tile-partition independent — fwd/dgrad/wgrad pick
   different lane tiles at 320 channels, and gradient parity across them
   only holds if every kernel reconstructs the same global mask;
3. the stream is statistically sound (keep rate, byte uniformity);
4. the model-level flag (`use_inkernel_dropout` -> blocks._dropout_bits)
   switches a training forward/backward without changing eligibility.

Reference parity target: Dropout semantics of the reference's
residual_block.py (torch.nn.Dropout inside the block) — same keep
probability and 1/keep scaling, sanctioned bit-stream divergence (like
the lane layout's, models/blocks.py docstring).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_ddp_resnet_tpu.ops.pallas.fused_block import (
    dropout_thresh,
    fused_half,
    fused_half_int8,
)


def _hash_at(idx: np.ndarray, seed: int) -> np.ndarray:
    """_seed_bits at arbitrary uint32 global indices: uint32 arithmetic has
    the same wraparound bit patterns as the kernel's int32 ops."""
    s = np.uint32(np.int64(seed) & 0xFFFFFFFF)
    h = idx.astype(np.uint32) * np.uint32(0x9E3779B1) + s
    h ^= h >> np.uint32(16)
    h ^= _fmix_seed(seed)
    h *= np.uint32(0x85EBCA6B)
    h ^= h >> np.uint32(13)
    h *= np.uint32(0xC2B2AE35)
    h ^= h >> np.uint32(16)
    return (h >> np.uint32(24)).astype(np.uint8)


def host_bits(seed: int, cin: int, n: int) -> np.ndarray:
    """Numpy mirror of _seed_bits."""
    idx = np.arange(cin * n, dtype=np.uint32).reshape(cin, n)
    return _hash_at(idx, seed)


def _fmix_seed(seed: int) -> np.ndarray:
    """The scalar seed finalizer (murmur3 fmix of the seed itself)."""
    with np.errstate(over="ignore"):
        s = np.uint32(np.int64(seed) & 0xFFFFFFFF)
        s ^= s >> np.uint32(16)
        s = np.uint32((int(s) * 0x85EBCA6B) & 0xFFFFFFFF)
        s ^= s >> np.uint32(13)
        s = np.uint32((int(s) * 0xC2B2AE35) & 0xFFFFFFFF)
        s ^= s >> np.uint32(16)
    return s


def _operands(cin, cout, b, h, w, dtype=jnp.float32, res=True):
    rng = np.random.RandomState(0)
    n = b * h * w
    x = jnp.asarray(rng.randn(cin, n), dtype)
    wts = jnp.asarray(0.1 * rng.randn(3, 3, cin, cout), jnp.float32)
    scale = jnp.asarray(1.0 + 0.1 * rng.randn(cin), jnp.float32)
    shift = jnp.asarray(0.1 * rng.randn(cin), jnp.float32)
    r = jnp.asarray(rng.randn(cout, n), dtype) if res else None
    return x, wts, scale, shift, r


@pytest.mark.parametrize("quant", [False, True])
def test_seed_mode_matches_array_mode(quant):
    """Seed mode == array mode fed the host-mirrored bits, bit for bit."""
    cin = cout = 32
    b, h, w = 4, 8, 8
    x, wts, scale, shift, res = _operands(cin, cout, b, h, w)
    seed = jnp.int32(-123456789)
    bits = jnp.asarray(host_bits(-123456789, cin, b * h * w))
    half = fused_half_int8 if quant else fused_half

    def run(bits_arg):
        return half(x, wts, scale, shift, bits_arg, res, dropout_rate=0.3,
                    h=h, w_img=w, want_stats=True, interpret=True)

    ys, _, _ = run(seed)
    ya, _, _ = run(bits)
    np.testing.assert_array_equal(np.asarray(ys), np.asarray(ya))


@pytest.mark.slow
@pytest.mark.parametrize("quant_bwd", [False, True])
def test_gradients_match_array_mode_across_tile_sizes(quant_bwd):
    """320 channels: the fwd (tile 1024), dgrad (2048) and wgrad (2048)
    kernels partition the lanes differently in quant mode; gradient parity
    with the array-mode run holds only if each reconstructs the identical
    global mask."""
    cin = cout = 320
    b, h, w = 64, 8, 8
    n = b * h * w
    x, wts, scale, shift, res = _operands(cin, cout, b, h, w)
    seed = jnp.int32(987654321)
    bits = jnp.asarray(host_bits(987654321, cin, n))

    def loss(bits_arg, xx, ww, ss, tt, rr):
        y, ysum, yssq = fused_half_int8(
            xx, ww, ss, tt, bits_arg, rr, dropout_rate=0.3, h=h, w_img=w,
            want_stats=True, quant_bwd=quant_bwd, interpret=True)
        return (jnp.sum(y.astype(jnp.float32) * jnp.cos(
            jnp.arange(y.size, dtype=jnp.float32)).reshape(y.shape))
            + jnp.sum(ysum * yssq))

    gs = jax.grad(loss, argnums=(1, 2, 3, 4, 5))(
        seed, x, wts, scale, shift, res)
    ga = jax.grad(loss, argnums=(1, 2, 3, 4, 5))(
        bits, x, wts, scale, shift, res)
    for s_, a_ in zip(gs, ga):
        np.testing.assert_array_equal(np.asarray(s_), np.asarray(a_))


def test_standalone_quant_backward_kernels_seed_parity():
    """The >320-channel FQT branch runs the STANDALONE quant dgrad and
    wgrad kernels (not the fused _bwd_call); drive them directly with a
    seed vs the mirrored bits array."""
    import pytorch_ddp_resnet_tpu.ops.pallas.fused_block as fb

    cin = cout = 32
    b, h, w = 4, 8, 8
    n = b * h * w
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(cin, n), jnp.float32)
    dy = jnp.asarray(rng.randn(cout, n), jnp.float32)
    y = jnp.asarray(rng.randn(cout, n), jnp.float32)
    dysum = jnp.asarray(rng.randn(cout), jnp.float32)
    dyssq = jnp.asarray(rng.randn(cout), jnp.float32)
    wts = jnp.asarray(0.1 * rng.randn(3, 3, cin, cout), jnp.float32)
    scale = jnp.asarray(1.0 + 0.1 * rng.randn(cin), jnp.float32)
    shift = jnp.asarray(0.1 * rng.randn(cin), jnp.float32)
    thresh = dropout_thresh(0.3)
    seed = jnp.int32(55555)
    bits = jnp.asarray(host_bits(55555, cin, n))
    w_dg, ws_in = fb._quantize_pack_weights_dgrad(wts)

    out_s = fb._dgrad_call(dy, y, dysum, dyssq, x, w_dg, scale, shift,
                           seed, thresh=thresh, h=h, w_img=w,
                           use_res=True, use_stats_ct=True, interpret=True,
                           wscale_in=ws_in)
    out_a = fb._dgrad_call(dy, y, dysum, dyssq, x, w_dg, scale, shift,
                           bits, thresh=thresh, h=h, w_img=w,
                           use_res=True, use_stats_ct=True, interpret=True,
                           wscale_in=ws_in)
    for s_, a_ in zip(out_s, out_a):
        np.testing.assert_array_equal(np.asarray(s_), np.asarray(a_))
    dw_s = fb._wgrad_call(dy, y, dysum, dyssq, x, scale, shift, seed,
                          thresh=thresh, h=h, w_img=w, use_stats_ct=True,
                          interpret=True, quant=True)
    dw_a = fb._wgrad_call(dy, y, dysum, dyssq, x, scale, shift, bits,
                          thresh=thresh, h=h, w_img=w, use_stats_ct=True,
                          interpret=True, quant=True)
    np.testing.assert_array_equal(np.asarray(dw_s), np.asarray(dw_a))


@pytest.mark.slow
def test_shard_map_seed_path_runs():
    """Pod dispatch: with `shard_mesh` threaded, each data shard derives
    its own in-kernel seed (fold_in(key, axis_index) -> _dropout_bits);
    the fused half runs under jax.shard_map and keeps exact sync-BN sums
    (stats equal the host-side recomputation from the sharded output)."""
    from jax.sharding import Mesh
    from pytorch_ddp_resnet_tpu.models.blocks import ResidualBlock

    devs = np.array(jax.devices()[:4])
    mesh = Mesh(devs, ("data",))
    blk = ResidualBlock(
        channels=32, downsample=False, preact=True, use_proj=False,
        dropout_prob=0.3, compute_dtype=jnp.float32, int8_train=True,
        int8_train_bwd=True, inkernel_dropout=True, shard_mesh=mesh)
    params, state, _ = blk.init(jax.random.key(0), (8, 8, 32))
    x = jax.random.normal(jax.random.key(1), (8, 8, 8, 32))
    y, _ = blk.apply(params, state, x, train=True, rng=jax.random.key(2))
    assert y.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(y.astype(jnp.float32))))
    # dropout actually fired: some prologue activations were zeroed, so
    # the output differs from the dropout-free block
    blk0 = ResidualBlock(
        channels=32, downsample=False, preact=True, use_proj=False,
        dropout_prob=0.0, compute_dtype=jnp.float32, int8_train=True,
        int8_train_bwd=True, shard_mesh=mesh)
    y0, _ = blk0.apply(params, state, x, train=True, rng=jax.random.key(2))
    assert float(jnp.max(jnp.abs(y - y0))) > 0


def test_stream_statistics():
    """Keep rate within binomial noise; byte histogram near-uniform."""
    bits = host_bits(42, 256, 4096).ravel()
    n = bits.size  # 1M
    thresh = dropout_thresh(0.3)  # 179
    keep = float((bits < thresh).mean())
    p = thresh / 256.0
    sigma = (p * (1 - p) / n) ** 0.5
    assert abs(keep - p) < 5 * sigma
    hist = np.bincount(bits, minlength=256)
    assert hist.min() > 0.9 * n / 256
    assert hist.max() < 1.1 * n / 256
    # different seeds decorrelate: matching bytes at chance level
    other = host_bits(43, 256, 4096).ravel()
    match = float((bits == other).mean())
    assert abs(match - 1 / 256) < 5 * ((1 / 256) * (255 / 256) / n) ** 0.5


def test_streams_not_translations():
    """Round-3 advisor finding: with seed mixed only additively before the
    murmur finalizer, seed s2's stream was EXACTLY seed s1's stream shifted
    by delta = (s2-s1) * GOLD^-1 mod 2^32 (the pre-finalizer state
    h0 = idx*GOLD + s is a bijection of idx, so translating idx by delta
    reproduced h0). The keyed re-mix inside the finalizer must break this:
    hash(idx + delta, s1) vs hash(idx, s2) matches only at chance level,
    as do all small shifts (the overlapping-mask regime)."""
    n = 1 << 20
    idx = np.arange(n, dtype=np.uint64)
    gold_inv = pow(0x9E3779B1, -1, 1 << 32)
    sigma = ((1 / 256) * (255 / 256) / n) ** 0.5
    for s1, s2 in [(42, 43), (7, 1000003), (-5, 5)]:
        delta = ((s2 - s1) * gold_inv) % (1 << 32)
        a = _hash_at((idx + delta) % (1 << 32), s1)
        b = _hash_at(idx, s2)
        match = float((a == b).mean())
        assert abs(match - 1 / 256) < 6 * sigma, (s1, s2, delta, match)
    for shift in (1, 2, 17, 63):
        a = _hash_at(idx + shift, 11)
        b = _hash_at(idx, 12)
        match = float((a == b).mean())
        assert abs(match - 1 / 256) < 6 * sigma, (shift, match)


def test_bits_argument_validation():
    """Python ints and non-int32 scalars are rejected with clear errors
    (advisor: a float scalar silently selected seed mode; a python int
    failed obscurely inside pallas_call)."""
    x = jnp.zeros((32, 256), jnp.float32)
    wts = jnp.zeros((3, 3, 32, 32), jnp.float32)
    v = jnp.zeros((32,), jnp.float32)

    def run(bits):
        return fused_half(x, wts, v, v, bits, None, dropout_rate=0.3,
                          h=16, w_img=16, interpret=True)

    with pytest.raises(ValueError, match="python int"):
        run(123)
    with pytest.raises(ValueError, match="must be int32"):
        run(jnp.uint32(5))
    with pytest.raises(ValueError, match="must be int32"):
        run(jnp.float32(0.5))


def test_seed_refused_beyond_i32_indexing():
    x = jnp.zeros((32, 256), jnp.float32)
    wts = jnp.zeros((3, 3, 32, 32), jnp.float32)
    v = jnp.zeros((32,), jnp.float32)
    with pytest.raises(ValueError, match="2\\^31"):
        # fake the overflow by checking the guard directly on a big fake
        # shape is impossible without allocating; exercise the guard via
        # a tiny monkeypatched shape instead
        import pytorch_ddp_resnet_tpu.ops.pallas.fused_block as fb
        big = jax.ShapeDtypeStruct((65536, 65536), jnp.float32)

        class _Fake:
            shape = big.shape
            dtype = big.dtype
            ndim = 2

        fb.fused_half(_Fake(), wts, v, v, jnp.int32(1), None,
                      dropout_rate=0.3, h=256, w_img=256, interpret=True)


@pytest.mark.slow
def test_model_level_flag_trains():
    """ResidualBlock with int8_train + inkernel_dropout: one fwd/bwd on
    the lane path runs and produces finite, nonzero gradients that differ
    from the materialized-bits run only through the bit stream."""
    from pytorch_ddp_resnet_tpu.models.blocks import ResidualBlock

    def make(inkernel):
        return ResidualBlock(
            channels=32, downsample=False, preact=True, use_proj=True,
            dropout_prob=0.3, compute_dtype=jnp.float32,
            int8_train=True, int8_train_bwd=True,
            inkernel_dropout=inkernel)

    rng = jax.random.key(0)
    blk = make(True)
    params, state, _ = blk.init(rng, (8, 8, 32))
    x = jax.random.normal(jax.random.key(1), (16, 8, 8, 32))

    def make_loss(b):
        def loss(p):
            y, _ = b.apply(p, state, x, train=True, rng=jax.random.key(2))
            return jnp.sum(jnp.square(y.astype(jnp.float32)))
        return loss

    val_in, g_in = jax.value_and_grad(make_loss(blk))(params)
    assert np.isfinite(float(val_in))
    leaves = jax.tree_util.tree_leaves(g_in)
    assert all(np.all(np.isfinite(np.asarray(v))) for v in leaves)
    assert any(float(jnp.max(jnp.abs(v))) > 0 for v in leaves)
    # flag off: same geometry still runs, different bit stream
    val_off = make_loss(make(False))(params)
    assert np.isfinite(float(val_off))
    assert float(val_off) != float(val_in)
