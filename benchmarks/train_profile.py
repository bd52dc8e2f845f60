#!/usr/bin/env python
"""Where does MIBF TRAIN-step time go? Ablation timing on the real chip.

Times variants of the real Trainer train step (each as a K-step
loop-variant lax.scan chain, LICM-proof, one hard host fetch):

  full            aug + fwd + bwd + Adam update (the production step)
  no_aug          pre-augmented f32 inputs (isolates the aug pipeline)
  no_dropout      deterministic forward (isolates dropout RNG cost)
  fwd_bwd_only    gradients but no optimizer update (isolates Adam)
  fwd_only        train-mode forward, no grad (bwd/fwd ratio)
  bert_fwd_bwd    BERT tower alone, fwd+bwd
  resnet_fwd_bwd  ResNet50 tower alone, fwd+bwd

Diagnostic only; bench.py remains the scored entry point.
"""

import json
import os
import tempfile
import time

os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

import jax
import jax.numpy as jnp
import numpy as np
import optax

BATCH = int(os.environ.get("BENCH_BATCH", "128"))
K = 8
N = 3


def chain_time(fn, *args):
    np.asarray(jax.tree_util.tree_leaves(fn(*args))[0])  # warmup/compile
    times = []
    for _ in range(N):
        t0 = time.perf_counter()
        np.asarray(jax.tree_util.tree_leaves(fn(*args))[0])
        times.append(time.perf_counter() - t0)
    return float(np.median(times)) / K * 1e3  # ms/step


def main():
    from mdhs_tpu.core.config import Config
    from mdhs_tpu.data.synthetic import generate_synthetic_dataset, synthetic_config
    from mdhs_tpu.train.trainer import Trainer

    report = {"batch": BATCH, "backend": jax.default_backend()}
    with tempfile.TemporaryDirectory() as tmp:
        paths = generate_synthetic_dataset(tmp, num_images=8, num_classes=7,
                                           image_size=256)
        cd = synthetic_config(paths, tmp, batch_size=BATCH, num_epochs=1,
                              max_length=128)
        cd["data"]["canvas"] = 256
        cd["data"]["image_size"] = 224
        cd["model"]["text_encoder"]["preset"] = "base"
        cd["training"]["precision"] = "bf16"
        trainer = Trainer(Config(cd), family="mibf",
                          output_dir=os.path.join(tmp, "run"), setup_data=False)

        rng = np.random.default_rng(0)
        batch = {
            "image": jnp.asarray(rng.integers(0, 255, (BATCH, 256, 256, 3), np.uint8)),
            "input_ids": jnp.asarray(rng.integers(0, 30000, (BATCH, 128), np.int32)),
            "attention_mask": jnp.ones((BATCH, 128), jnp.int32),
            "label": jnp.asarray(rng.integers(0, 7, (BATCH,), np.int32)),
        }
        state = trainer.state
        key = trainer.rng

        # ---- full step (the production path)
        step = trainer.train_step_fn()

        @jax.jit
        def full(state, batch):
            def body(s, _):
                s, m = step(s, batch, key)
                return s, m["loss"]
            return jax.lax.scan(body, state, None, length=K)[1]

        report["full_ms"] = chain_time(full, state, batch)

        # ---- no augmentation: pre-augmented images, loss on them directly
        images_aug = jax.jit(
            lambda r, im: trainer._preprocess_train(r, im)
        )(jax.random.PRNGKey(0), batch["image"])

        def make_noaug(deterministic: bool, with_opt: bool, with_bwd: bool):
            @jax.jit
            def run(state, images, batch):
                def body(carry, t):
                    s = carry
                    imgs = images + jnp.asarray(t, images.dtype) * 0  # loop-variant guard
                    drop = jax.random.fold_in(key, t)

                    def loss_fn(p):
                        variables = {"params": p, "batch_stats": s.batch_stats}
                        rngs = {"dropout": drop, "gating": drop}
                        out, new_vars = trainer.model.apply(
                            variables, imgs, batch["input_ids"],
                            batch["attention_mask"], train=True,
                            deterministic=deterministic, rngs=rngs,
                            mutable=["batch_stats"],
                        )
                        from mdhs_tpu.train.losses import mibf_loss
                        return mibf_loss(out, batch["label"], "KL_loss"), new_vars

                    if with_bwd:
                        (loss, new_vars), grads = jax.value_and_grad(
                            loss_fn, has_aux=True)(s.params)
                        if with_opt:
                            updates, opt_state = trainer.tx.update(
                                grads, s.opt_state, s.params)
                            params = optax.apply_updates(s.params, updates)
                            s = s.replace(step=s.step + 1, params=params,
                                          batch_stats=new_vars["batch_stats"],
                                          opt_state=opt_state)
                        else:
                            leaves = jax.tree_util.tree_leaves(grads)
                            loss = loss + sum(l.sum() for l in leaves) * 0e0
                            s = s.replace(step=s.step + 1,
                                          batch_stats=new_vars["batch_stats"])
                    else:
                        loss, new_vars = loss_fn(s.params)
                        s = s.replace(step=s.step + 1,
                                      batch_stats=new_vars["batch_stats"])
                    return s, loss
                return jax.lax.scan(body, state, jnp.arange(K))[1]
            return run

        report["no_aug_ms"] = chain_time(
            make_noaug(False, True, True), state, images_aug, batch)
        report["no_dropout_ms"] = chain_time(
            make_noaug(True, True, True), state, images_aug, batch)
        report["fwd_bwd_only_ms"] = chain_time(
            make_noaug(False, False, True), state, images_aug, batch)
        report["fwd_only_ms"] = chain_time(
            make_noaug(False, False, False), state, images_aug, batch)

        # ---- towers alone, fwd+bwd
        from mdhs_tpu.models.bert import BertConfig, BertModel
        from mdhs_tpu.models.resnet import ResNetClassifier

        bert = BertModel(BertConfig(), dtype=jnp.bfloat16)
        bv = jax.jit(lambda r: bert.init(
            r, batch["input_ids"][:2], batch["attention_mask"][:2]))(
            jax.random.PRNGKey(0))

        @jax.jit
        def bert_fb(params, ids, mask):
            def body(c, t):
                def loss(p):
                    out, _ = bert.apply(
                        {"params": p}, (ids + t) % 30000, mask,
                        deterministic=False, rngs={"dropout": jax.random.fold_in(key, t)})
                    return out.astype(jnp.float32).sum()
                g = jax.grad(loss)(params)
                return jax.tree_util.tree_map(lambda a, b: a + b * 0, c, g), None
            return jax.lax.scan(body, params, jnp.arange(K))[0]

        report["bert_fwd_bwd_ms"] = chain_time(
            bert_fb, bv["params"], batch["input_ids"], batch["attention_mask"])

        resnet = ResNetClassifier(backbone="resnet50", num_outputs=768,
                                  dtype=jnp.bfloat16)
        rv = jax.jit(lambda r: resnet.init(r, images_aug[:2]))(jax.random.PRNGKey(0))

        @jax.jit
        def resnet_fb(params, bs, imgs):
            def body(c, t):
                def loss(p):
                    out, _ = resnet.apply(
                        {"params": p, "batch_stats": bs},
                        imgs + jnp.asarray(t, imgs.dtype) * 0,
                        train=True, mutable=["batch_stats"])
                    return out[0].astype(jnp.float32).sum()
                g = jax.grad(loss)(params)
                return jax.tree_util.tree_map(lambda a, b: a + b * 0, c, g), None
            return jax.lax.scan(body, params, jnp.arange(K))[0]

        report["resnet_fwd_bwd_ms"] = chain_time(
            resnet_fb, rv["params"], rv["batch_stats"], images_aug)

    report = {k: (round(v, 2) if isinstance(v, float) else v)
              for k, v in report.items()}
    report["aug_ms"] = round(report["full_ms"] - report["no_aug_ms"], 2)
    report["optimizer_ms"] = round(report["no_aug_ms"] - report["fwd_bwd_only_ms"], 2)
    report["dropout_ms"] = round(report["no_aug_ms"] - report["no_dropout_ms"], 2)
    report["bwd_ms"] = round(report["fwd_bwd_only_ms"] - report["fwd_only_ms"], 2)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
