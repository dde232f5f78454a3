"""Workflow-level integration: the reference's actual usage patterns."""

import numpy as np

from spectralae.core.config import Config, LayerParams
from spectralae.model.engine import Engine
from spectralae.data import pipeline


def make_engine(nx=32, m=6, lk=1, fft_iters=40):
    cfg = Config(nx=nx, ny=nx, d=3,
                 layer=LayerParams(depth=m, lk=lk, ll=lk, scale=2, rmax=0.5),
                 fft_iters=fft_iters)
    return Engine(cfg, seed=0)


def fixed_frame(nx=32):
    f = next(pipeline.synthetic_frames(nx, nx, seed=3))
    return pipeline.frame_to_tensor(f)


def recon_err(eng, x):
    out = eng.step(x)
    return float(np.mean((out - x) ** 2))


def test_progressive_deepening_workflow():
    """Train pair 0 → add a layer → train the new inner pair → overall
    reconstruction improves (the reference's 'n' + per-layer training flow)."""
    eng = make_engine()
    x = fixed_frame()
    err0 = recon_err(eng, x)
    for _ in range(3):
        eng.toggle_training()
        eng.step(x)
    err1 = recon_err(eng, x)
    assert err1 < err0, (err0, err1)

    eng.add_layer()                       # selects the new inner pair
    assert eng.flags.n_l == 1
    err2 = recon_err(eng, x)              # untrained inner pair hurts
    for _ in range(4):
        eng.toggle_training()
        eng.step(x)
    err3 = recon_err(eng, x)
    assert err3 < err2, (err2, err3)


def test_inner_layer_coord_training():
    """Coordinate-domain training focused on the inner pair of a 2-pair net."""
    eng = make_engine()
    eng.add_layer()
    eng.toggle_fft()                      # coord mode
    eng.toggle_training()
    x = fixed_frame()
    first = None
    for _ in range(12):
        eng.step(x)
        if first is None:
            first = eng.last_mse
    assert np.isfinite(eng.last_mse)
    assert eng.last_mse < first


def test_large_kernel_burst():
    """13×13 kernels (Lk=5) through the full spectral burst path."""
    eng = make_engine(nx=32, m=4, lk=5, fft_iters=30)
    assert eng.params.stages[0].nk == 13
    x = fixed_frame()
    err0 = recon_err(eng, x)
    eng.toggle_training()
    eng.step(x)
    assert np.isfinite(eng.last_mse)
    err1 = recon_err(eng, x)
    assert err1 < err0


def test_symmetric_training_workflow():
    """'p' then train: f stays tied to cᵀ across coord steps."""
    eng = make_engine()
    eng.toggle_fft()
    eng.toggle_symmetric()
    eng.toggle_training()
    x = fixed_frame()
    for _ in range(5):
        eng.step(x)
    enc, dec = eng.params.pair(0)
    np.testing.assert_array_equal(
        np.asarray(dec.c), np.asarray(enc.c).transpose(1, 0, 2, 3))


def test_multiobjective_engages_and_still_reconstructs():
    """'m' mode changes the training trajectory (the diversity term is in
    the update) while reconstruction still improves."""
    x = fixed_frame()
    eng_plain = make_engine()
    eng_div = make_engine()
    eng_div.toggle_maxdiff()
    err0 = recon_err(eng_div, x)
    for eng in (eng_plain, eng_div):
        for _ in range(3):
            eng.toggle_training()
            eng.step(x)
    c_plain = np.asarray(eng_plain.params.stages[0].c)
    c_div = np.asarray(eng_div.params.stages[0].c)
    assert not np.array_equal(c_plain, c_div)   # term engaged
    assert recon_err(eng_div, x) < err0         # still learning


def test_production_features_compose():
    """bf16 streaming + remat + grad accumulation + optax all compose in
    one training run and still converge."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from spectralae.core.config import Config, LayerParams
    from spectralae.core.types import init_params, initial_spec
    from spectralae.train.modern import (make_optax_train_step,
                                         make_optimizer)
    cfg = Config(nx=16, ny=16, d=2,
                 layer=LayerParams(depth=4, lk=0, ll=0, scale=2, rmax=0.5))
    spec = initial_spec(cfg)
    params = init_params(jax.random.key(0), spec, 0.5)
    optimizer = make_optimizer("adam", 0.3)
    step = make_optax_train_step(optimizer, domain="fft",
                                 compute_dtype=jnp.bfloat16, remat=True,
                                 accum_steps=2)
    opt = optimizer.init(params)
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(4, 2, 16, 16)).astype(np.float32)) * 20
    losses = []
    for _ in range(30):
        res = step(params, opt, x, spec.scales)
        params, opt = res.params, res.opt
        losses.append(float(res.loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.9
    assert params.stages[0].c.dtype == jnp.float32
