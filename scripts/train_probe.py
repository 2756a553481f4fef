"""Trainer perf split probe (run from repo root): where does a train step's
time go?  Times, with bench.py's fori_loop differencing methodology:
  - full Adam step (the production train_step body)
  - same body with optax.sgd (isolates optimizer-side cost: sgd's update
    is one axpy, ~0.15 ms of HBM traffic at 10.2M params)
  - value_and_grad only (grads consumed by a tiny axpy so they survive DCE)
NOTE: a forward-only loop is NOT timed — its body is loop-invariant (same
params/x every iteration) and XLA hoists it, timing only loop overhead
(measured: 0.27 ms for a ~6.5 ms forward).

Measured result (TPU v5e, B=7000, ARCHITECTURE.md §6 ceiling 4): Adam adds
~0.7 ms (~4%) to the 17.8 ms fp32 step and ~0 to the 3.6 ms bf16 step —
the optimizer is NOT the trainer bottleneck; a fused-Adam kernel has no
headroom here."""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from icra2021_multimodal_ad_tpu.config import Config, get_input_size
    from icra2021_multimodal_ad_tpu.models.autoencoder import ae_loss
    from icra2021_multimodal_ad_tpu.models.builder import get_model
    from icra2021_multimodal_ad_tpu.utils.compile_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()
    cfg = Config(sensor="All", n_layers=5, btl_size=100)
    cfg = cfg.replace(input_size=get_input_size(cfg))
    model, params, state = get_model(cfg)
    rng = np.random.default_rng(0)
    Bt = 7000

    def timed(loop, *args):
        float(loop(*args, 1))
        t0 = time.perf_counter()
        float(loop(*args, 1))
        t1 = time.perf_counter() - t0
        float(loop(*args, 6))
        t0 = time.perf_counter()
        float(loop(*args, 6))
        t6 = time.perf_counter() - t0
        return (t6 - t1) / 5

    def make_step(optimizer, xt):
        @partial(jax.jit, static_argnames=("n",))
        def loop(p, s, o, n):
            def body(i, carry):
                p, s, o, acc = carry

                def loss_of(pp):
                    loss, new_s = ae_loss(model, pp, s, xt, train=True)
                    return loss, new_s

                (loss, new_s), grads = jax.value_and_grad(
                    loss_of, has_aux=True)(p)
                upd, o2 = optimizer.update(grads, o, p)
                return (optax.apply_updates(p, upd), new_s, o2, acc + loss)
            out = jax.lax.fori_loop(0, n, body, (p, s, o, jnp.float32(0)))
            return out[3]
        return loop

    def make_grad(xt):
        @partial(jax.jit, static_argnames=("n",))
        def loop(p, s, n):
            def body(i, carry):
                p, s, acc = carry

                def loss_of(pp):
                    loss, new_s = ae_loss(model, pp, s, xt, train=True)
                    return loss, new_s

                (loss, new_s), grads = jax.value_and_grad(
                    loss_of, has_aux=True)(p)
                # consume grads with a real (non-zero) axpy so nothing is
                # DCE'd or loop-hoisted: p changes every iteration
                p2 = jax.tree.map(lambda a, g: a - 1e-12 * g, p, grads)
                return (p2, new_s, acc + loss)
            out = jax.lax.fori_loop(0, n, body, (p, s, jnp.float32(0)))
            return out[2]
        return loop

    for dtype in (jnp.float32, jnp.bfloat16):
        xt = jnp.asarray(rng.normal(size=(Bt, cfg.input_size)), dtype)
        name = jnp.dtype(dtype).name

        t_grad = timed(make_grad(xt), params, state)

        adam = optax.adam(1e-3)
        t_adam = timed(make_step(adam, xt), params, state, adam.init(params))

        sgd = optax.sgd(1e-3)
        t_sgd = timed(make_step(sgd, xt), params, state, sgd.init(params))

        print(f"[{name}] grad-only {t_grad*1e3:7.2f} ms | sgd step "
              f"{t_sgd*1e3:7.2f} ms | adam step {t_adam*1e3:7.2f} ms | "
              f"adam-vs-sgd overhead {(t_adam-t_sgd)*1e3:.2f} ms")


if __name__ == "__main__":
    main()
