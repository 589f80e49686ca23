#!/usr/bin/env python
"""QAT payoff: does fake-quant STE training reduce post-quantization drift?

The reference vendors an FX-QAT module
(/root/reference/deit_pruning/vendor/nn_pruning_v1/nn_pruning/modules/quantization.py)
whose entire purpose is *better int8 accuracy*.  Round 3 measured our QAT
step cost (+0.3-3%/step, BENCHMARKS.md training_steps) but never the payoff.
This experiment closes that (VERDICT round-3 directive #3):

  * deit_tiny, random init, fp32, CPU (the logit oracle backend).
  * Synthetic memorization task: fixed random-normal images with fixed
    random labels (no network egress — same stand-in as quant_accuracy).
  * Train two copies from the SAME init on the SAME batches/steps/optimizer:
    plain, and QAT (fake_quant_vit_encoder in the training forward — the
    deployment quantizer itself as the fake-quant, ops/quant.py:90).
  * For each trained model: static-int8 (absmax calibration, the deployment
    default) + dynamic-int8 drift vs that model's OWN fp32 logits on
    held-out data, plus train-set accuracy fp32 vs static-int8.

Expected: the QAT model's weights sit on the int8 grid its forward was
trained through, so weight-rounding error ~vanishes and static-int8 drift /
accuracy-loss shrinks vs the plain model.  Win or null, the result is
recorded in BENCHMARKS.md (qat_payoff section).

Run (CPU, ~12 min):
    python tools/qat_payoff.py [--steps 96] [--out qat_payoff.json]
"""
import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402

from edgevisiontransformer_tpu.cli import _build_model  # noqa: E402
from edgevisiontransformer_tpu.ops.quant import (  # noqa: E402
    calibrate_vit,
    fake_quant_vit_apply_observed,
    fake_quant_vit_apply_static,
    fake_quant_vit_encoder,
    int8_vit_apply,
    int8_vit_apply_static,
    quantize_vit_params_int8,
    quantize_vit_params_int8_static,
)
from edgevisiontransformer_tpu.parallel.train import (  # noqa: E402
    cross_entropy,
    make_train_step,
)


def train(model, params, apply_fn, batches, epochs, lr, tag):
    tx = optax.adamw(lr)
    step_fn = jax.jit(make_train_step(apply_fn, tx, cross_entropy))
    opt = tx.init(params)
    t0, k = time.time(), 0
    for ep in range(epochs):
        for imgs, labels in batches:
            params, opt, m = step_fn(params, opt, imgs, labels)
            k += 1
        print(f"[{tag}] epoch {ep} step {k} loss {float(m['loss']):.4f} "
              f"({(time.time() - t0) / k:.2f} s/step)", flush=True)
    return params


def train_observer(model, params, batches, epochs, lr, scales0, ema, tag):
    """Static-aware QAT with LIVE activation observers: each step trains
    through fq(x; scales) and EMAs the scales toward that batch's absmax —
    the reference FX-QAT MovingAverage observer (averaging_constant
    analogue), so the scales track the weights as they drift instead of
    staying frozen at init (the measured r4 staleness cap)."""
    tx = optax.adamw(lr)

    def loss_of(p, scales, imgs, labels):
        logits, seen = fake_quant_vit_apply_observed(model, p, scales, imgs)
        return cross_entropy(logits, labels), seen

    @jax.jit
    def step_fn(params, opt, scales, imgs, labels):
        (loss, seen), grads = jax.value_and_grad(loss_of, has_aux=True)(
            params, scales, imgs, labels)
        updates, opt = tx.update(grads, opt, params)
        params = optax.apply_updates(params, updates)
        scales = (1.0 - ema) * scales + ema * (seen / 127.0)
        return params, opt, scales, loss

    opt = tx.init(params)
    scales = jnp.asarray(scales0, jnp.float32)
    t0, k = time.time(), 0
    for ep in range(epochs):
        for imgs, labels in batches:
            params, opt, scales, loss = step_fn(params, opt, scales,
                                                imgs, labels)
            k += 1
        print(f"[{tag}] epoch {ep} step {k} loss {float(loss):.4f} "
              f"({(time.time() - t0) / k:.2f} s/step)", flush=True)
    return params


def drift_stats(model, params, eval_batches, train_batches, calib_n):
    """Quantization drift vs this model's own fp32 logits + train accuracy."""
    ref_fn = jax.jit(lambda p, x: model.apply(p, x))
    scales = calibrate_vit(model, params, n=calib_n)
    qstat = quantize_vit_params_int8_static(params, scales)
    qdyn = quantize_vit_params_int8(params)
    modes = {
        "dynamic_int8": jax.jit(
            lambda q, x: int8_vit_apply(model, q, x)),
        "static_int8": jax.jit(
            lambda q, x: int8_vit_apply_static(model, q, x)),
    }
    qparams = {"dynamic_int8": qdyn, "static_int8": qstat}
    out = {}
    for m, fn in modes.items():
        st = {"max_abs": 0.0, "max_rel": 0.0, "agree": 0, "n": 0}
        for xb in eval_batches:
            ref = np.asarray(ref_fn(params, xb))
            got = np.asarray(fn(qparams[m], xb)).astype(np.float32)
            denom = np.abs(ref).max() + 1e-9
            st["max_abs"] = max(st["max_abs"], float(np.abs(got - ref).max()))
            st["max_rel"] = max(st["max_rel"],
                                float(np.abs(got - ref).max() / denom))
            st["agree"] += int((got.argmax(-1) == ref.argmax(-1)).sum())
            st["n"] += ref.shape[0]
        out[m] = st
    # train-set accuracy: fp32 vs static int8 (the QAT "accuracy" story)
    acc = {"fp32": 0, "static_int8": 0, "n": 0}
    for imgs, labels in train_batches:
        lab = np.asarray(labels)
        acc["fp32"] += int((np.asarray(ref_fn(params, imgs)).argmax(-1)
                            == lab).sum())
        acc["static_int8"] += int(
            (np.asarray(modes["static_int8"](qstat, imgs)).argmax(-1)
             == lab).sum())
        acc["n"] += lab.shape[0]
    out["train_acc"] = acc
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="deit_tiny")
    ap.add_argument("--steps", type=int, default=96,
                    help="total steps per run (epochs = steps / n_batches)")
    ap.add_argument("--n-batches", type=int, default=12)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--classes", type=int, default=1000)
    ap.add_argument("--eval-batches", type=int, default=8)
    ap.add_argument("--calib-batches", type=int, default=32)
    ap.add_argument("--out", default=None)
    ap.add_argument("--arms", nargs="+",
                    default=["plain", "qat", "qat_static", "qat_observer"])
    ap.add_argument("--observer-ema", type=float, default=0.05,
                    help="EMA constant for the live-observer arm (FX-QAT "
                    "MovingAverageObserver averaging_constant analogue)")
    args = ap.parse_args()

    model, in_shape = _build_model(args.model, "standard", dtype="float32")
    rng = np.random.RandomState(0)
    train_batches = [
        (jnp.asarray(rng.randn(args.batch, *in_shape).astype(np.float32)),
         jnp.asarray(rng.randint(0, args.classes, args.batch)))
        for _ in range(args.n_batches)]
    erng = np.random.RandomState(1234)
    eval_batches = [
        jnp.asarray(erng.randn(args.batch, *in_shape).astype(np.float32))
        for _ in range(args.eval_batches)]
    epochs = max(1, args.steps // args.n_batches)

    params0 = model.init(jax.random.key(0),
                         jnp.ones((1,) + in_shape, jnp.float32))

    plain_apply = lambda p, x: model.apply(p, x)
    qat_apply = lambda p, x: model.apply(fake_quant_vit_encoder(p), x)
    # static-aware QAT: activation fake-quant at the calibrated INIT scales
    # (fixed through training) + weight STE — the deployment quantizer
    # end-to-end, like the reference FX-QAT's activation observers
    scales0 = calibrate_vit(model, params0, n=args.calib_batches)
    qat_static_apply = lambda p, x: fake_quant_vit_apply_static(
        model, p, scales0, x)

    results = {"config": {k: getattr(args, k) for k in
                          ("model", "steps", "n_batches", "batch", "lr",
                           "classes", "eval_batches", "calib_batches",
                           "observer_ema")}}
    results["init"] = drift_stats(model, params0, eval_batches,
                                  train_batches, args.calib_batches)
    print("init drift:", json.dumps(results["init"]), flush=True)

    arms = [a for a in ("plain", "qat", "qat_static", "qat_observer")
            if a in args.arms]
    named = {"plain": plain_apply, "qat": qat_apply,
             "qat_static": qat_static_apply}
    for tag in arms:
        if tag == "qat_observer":
            p = train_observer(model, params0, train_batches, epochs,
                               args.lr, scales0, args.observer_ema, tag)
        else:
            p = train(model, params0, named[tag], train_batches, epochs,
                      args.lr, tag)
        results[tag] = drift_stats(model, p, eval_batches, train_batches,
                                   args.calib_batches)
        print(f"{tag} drift:", json.dumps(results[tag]), flush=True)

    print(f"\n{'model':<10} {'mode':<14} {'max|dlogit|':>12} {'max rel':>9} "
          f"{'argmax agree':>13} {'train acc fp32->int8':>22}")
    for tag in ["init"] + arms:
        r = results[tag]
        for m in ("dynamic_int8", "static_int8"):
            st = r[m]
            acc = r["train_acc"]
            accs = (f"{acc['fp32']}/{acc['n']} -> "
                    f"{acc['static_int8']}/{acc['n']}"
                    if m == "static_int8" else "")
            print(f"{tag:<10} {m:<14} {st['max_abs']:>12.4f} "
                  f"{st['max_rel']:>9.4f} {st['agree']:>6}/{st['n']:<6} "
                  f"{accs:>22}")
    print(json.dumps(results))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
