"""BatchNorm folding (models/fold.py) and AOT export (algos/predict.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pytorch_ddp_resnet_tpu.models import ResNet
from pytorch_ddp_resnet_tpu.models.fold import fold_batchnorm


def _trained_like_state(model, rng_key, hw=32):
    """init + perturb the BN stats so folding has something nontrivial."""
    params, state = model.init(jax.random.key(0), (hw, hw, 3))
    rng = np.random.default_rng(rng_key)

    def perturb(tree, scale_pos=False):
        def f(path, v):
            leafname = str(path[-1])
            arr = np.asarray(v)
            noise = rng.normal(0, 0.3, arr.shape).astype(arr.dtype)
            if "var" in leafname:
                return jnp.asarray(np.abs(arr + noise) + 0.05)
            if "count" in leafname:
                return v
            return jnp.asarray(arr + noise)
        return jax.tree_util.tree_map_with_path(f, tree)

    return perturb(params), perturb(state)


V1_SPECS = [
    ("resnet20", "c3,16,3,1,1 n a r2 r2 ap16,1,0 fc32,10", False, False),
    ("bottleneck", "c3,32,3,1,1 n a b2 b2 ap16,1,0 fc64,10", False, True),
    ("extended", "c3,16,3,1,1 n a b2,64,16,1 ap32,1,0 fc64,10", False, True),
]


@pytest.mark.parametrize("name,spec,preact,proj", V1_SPECS)
def test_fold_preserves_eval_outputs(name, spec, preact, proj):
    model = ResNet(spec, preact, proj, 0.0, compute_dtype=jnp.float32)
    params, state = _trained_like_state(model, 1)
    x = jnp.asarray(np.random.default_rng(2).normal(
        size=(4, 32, 32, 3)).astype(np.float32))
    ref, _ = model.apply(params, state, x, train=False)
    fp, fs, n = fold_batchnorm(model, params, state)
    assert n > 0, "v1 nets must fold at least the stem pair"
    got, _ = model.apply(fp, fs, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_fold_counts_pairs():
    model = ResNet("c3,16,3,1,1 n a r2 r2 ap16,1,0 fc32,10",
                   False, False, 0.0, compute_dtype=jnp.float32)
    params, state = model.init(jax.random.key(0), (32, 32, 3))
    _, _, n = fold_batchnorm(model, params, state)
    # stem pair + 4 blocks x 2 convs
    assert n == 1 + 4 * 2


def test_fold_skips_preact():
    model = ResNet("c3,16,3,1,1 r2 r2 n a ap16,1,0 fc32,10",
                   True, True, 0.0, compute_dtype=jnp.float32)
    params, state = model.init(jax.random.key(0), (32, 32, 3))
    x = jnp.asarray(np.random.default_rng(3).normal(
        size=(2, 32, 32, 3)).astype(np.float32))
    ref, _ = model.apply(params, state, x, train=False)
    fp, fs, n = fold_batchnorm(model, params, state)
    assert n == 0  # BN->relu->conv everywhere: nothing foldable
    got, _ = model.apply(fp, fs, x, train=False)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_predictor_folds_and_exports(tmp_path):
    from pytorch_ddp_resnet_tpu.algos.predict import (
        Predictor, export_predictor, load_exported)

    model = ResNet("c3,16,3,1,1 n a r1 ap32,1,0 fc16,10",
                   False, False, 0.0, compute_dtype=jnp.float32)
    params, state = _trained_like_state(model, 5)
    pre = lambda x: x.astype(jnp.float32) / 255.0  # noqa: E731

    plain = Predictor(model, params, state, pre, batch_size=8, fold_bn=False)
    folded = Predictor(model, params, state, pre, batch_size=8, fold_bn=True)
    assert folded.n_folded == 3
    imgs = np.random.default_rng(6).integers(
        0, 255, (11, 32, 32, 3)).astype(np.uint8)
    np.testing.assert_allclose(folded.logits(imgs), plain.logits(imgs),
                               rtol=2e-4, atol=2e-4)

    # export without a declared input shape must refuse (silently AOT-
    # compiling a guessed shape would bake a wrong signature into the
    # artifact for any non-CIFAR model)
    import pytest
    with pytest.raises(ValueError, match="input shape is unknown"):
        export_predictor(folded, str(tmp_path / "unset.stablehlo"))

    folded.set_input_shape((32, 32, 3))
    path = export_predictor(folded, str(tmp_path / "model.stablehlo"))
    fn = load_exported(path)
    out = np.asarray(fn(imgs[:8]))
    np.testing.assert_allclose(out, folded.logits(imgs[:8]),
                               rtol=1e-5, atol=1e-5)
