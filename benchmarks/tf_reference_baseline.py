#!/usr/bin/env python
"""Self-measured reference baseline: the reference's training pipeline
re-expressed in plain TF/Keras and run on CPU (SURVEY §6: "budget for
self-measured reference runs (CPU TF)"; VERDICT r1 missing #5).

Why not run `/root/reference` directly: `tensorflow_recommenders` and
`faiss` are not installed in this image and may not be installed.
Neither is needed for the training/eval math, though:

* ``tfrs.tasks.Retrieval()`` (reference ``src/models.py:116,137``) with
  default arguments is in-batch sampled softmax — categorical CE over
  the [B, B] logits ``U @ V.T`` with the diagonal as labels — which is
  ~10 lines of TF.
* FAISS only builds the serving index (``src/trainer.py:236-248``); the
  reference's own offline eval is a NumPy brute-force dot + argpartition
  (``src/trainer.py:195-219``), reproduced here verbatim in spirit.

Everything else follows the reference's behavior (not its code):
two-tower Embedding+MLP encoder (``src/models.py:59-102``), rank-1 DCN
cross + deep stack (``src/models.py:14-55``), rating MSE + class-
weighted CTR BCE heads (``src/models.py:106-159``), Adagrad over
staircase ExponentialDecay with clipnorm=1 (``src/trainer.py:157-163``),
balanced class weights (``src/trainer.py:139-146``), reference CLI
defaults (emb 64, cross 1, batch 2048, lr 1e-3, 5 epochs —
``scripts/train.py:60-125``), 1000-row sampled recall@k eval
(``src/trainer.py:195-219``).

Consumes the SAME preprocessed bundle as the TPU trainer, so quality
numbers are apples-to-apples.

Run:
  python scripts/preprocess.py --data_dir /root/reference/data/raw \
      --output /tmp/ml1m.npz
  python benchmarks/tf_reference_baseline.py --data /tmp/ml1m.npz \
      --out benchmarks/results/tf_reference_cpu.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_models(n_users, n_items, emb_dim, tower_dims, cross_layers,
                 dnn_dims, l2_reg):
    import tensorflow as tf
    from tensorflow import keras

    def tower(vocab, name):
        ids = keras.Input(shape=(), dtype=tf.int32, name=f"{name}_id")
        # +1 OOV row, Embedding(vocab+1, dim) parity (src/models.py:70-77)
        x = keras.layers.Embedding(vocab + 1, emb_dim)(ids)
        for d in tower_dims:
            x = keras.layers.Dense(d, activation="relu")(x)
        out = keras.layers.Dense(emb_dim)(x)
        return keras.Model(ids, out, name=f"{name}_tower")

    user_tower = tower(n_users, "user")
    item_tower = tower(n_items, "item")

    # DCN: rank-1 cross recurrence x_{l+1} = x0*(x_l.w) + b + x_l with a
    # VECTOR bias b (src/models.py:40-44) + parallel deep MLP, concat
    # output (src/models.py:46-50); L2 on deep kernels only (:26-29)
    class _VecBias(keras.layers.Layer):
        def build(self, shape):
            self.b = self.add_weight(shape=(shape[-1],), initializer="zeros")

        def call(self, x):
            return x + self.b

    d_in = 2 * emb_dim
    x0 = keras.Input(shape=(d_in,))
    xl = x0
    for _ in range(cross_layers):
        s = keras.layers.Dense(1, use_bias=False)(xl)  # x_l . w_l
        xl = _VecBias()(
            keras.layers.Add()([keras.layers.Multiply()([x0, s]), xl])
        )
    deep = x0
    for d in dnn_dims:
        deep = keras.layers.Dense(
            d, activation="relu",
            kernel_regularizer=keras.regularizers.l2(l2_reg))(deep)
    h = keras.layers.Concatenate()([xl, deep])
    rating = keras.layers.Dense(1)(h)
    ctr = keras.layers.Dense(1, activation="sigmoid")(h)
    heads = keras.Model(x0, [rating, ctr], name="dcn_heads")
    return user_tower, item_tower, heads


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True, help="preprocessed bundle (.npz)")
    ap.add_argument("--out", default="benchmarks/results/tf_reference_cpu.json")
    # reference CLI defaults (scripts/train.py:60-125)
    ap.add_argument("--embedding_dim", type=int, default=64)
    ap.add_argument("--cross_layers", type=int, default=1)
    ap.add_argument("--batch_size", type=int, default=2048)
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--learning_rate", type=float, default=1e-3)
    ap.add_argument("--ctr_weight", type=float, default=0.2)
    ap.add_argument("--rating_weight", type=float, default=0.2)
    ap.add_argument("--eval_sample", type=int, default=1000,
                    help="0 = full val split")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--filter_seen", action="store_true",
                    help="mask each user's train items before top-k "
                         "(protocol-matching knob: the reference never "
                         "filters, but on the synthetic data the "
                         "generator picks each user's HIGHEST-affinity "
                         "items as their history, so unfiltered "
                         "recall@k is near the random floor for ANY "
                         "model — this isolates model quality from "
                         "that artifact)")
    ap.add_argument("--preset", choices=["cli", "dataclass", "tuned"],
                    default=None,
                    help="cli = the reference's CLI defaults (the args "
                         "above); dataclass = its ModelConfig defaults "
                         "(/root/reference/src/config.py:14-40: dim 128, "
                         "cross 3, 20 epochs, ctr_weight 2.0) with a "
                         "full-split eval; tuned = the reference's MODEL "
                         "(plain in-batch softmax, no logQ/bias/masking) "
                         "under THIS framework's c3 training recipe "
                         "(Adam 5e-3 clipnorm 1, dim 128, cross 3, batch "
                         "4096, <=30 epochs with early stop on sampled "
                         "recall@10 every 3 epochs, patience 2) + "
                         "full-split filtered eval — the cross-framework "
                         "leg of BASELINE.md's quality attribution "
                         "(VERDICT r3 item 4)")
    args = ap.parse_args(argv)
    if args.preset == "dataclass":
        args.embedding_dim, args.cross_layers = 128, 3
        args.epochs, args.ctr_weight = 20, 2.0
        args.eval_sample = 0
    elif args.preset == "tuned":
        args.embedding_dim, args.cross_layers = 128, 3
        args.batch_size, args.epochs = 4096, 30
        args.learning_rate = 5e-3
        args.eval_sample = 0
        args.filter_seen = True

    import tensorflow as tf
    from tensorflow import keras

    tf.random.set_seed(args.seed)
    np.random.seed(args.seed)

    from recsys_tpu.data.preprocessing import load_bundle

    bundle = load_bundle(args.data)
    n_users = int(bundle["meta/n_users"])
    n_items = int(bundle["meta/n_movies"])
    uid = bundle["train/user_id"].astype(np.int32)
    mid = bundle["train/movie_id"].astype(np.int32)
    rating = bundle["train/rating"].astype(np.float32)
    y = bundle["train/y_implicit"].astype(np.float32)

    # balanced class weights (src/trainer.py:139-146): w_c = n / (2 n_c)
    n = len(y)
    n_pos = max(float(y.sum()), 1.0)
    w_pos, w_neg = n / (2 * n_pos), n / (2 * (n - n_pos))

    user_tower, item_tower, heads = build_models(
        n_users, n_items, args.embedding_dim,
        (256, 128, 64),  # reference tower defaults (src/config.py:15)
        args.cross_layers, (256, 128), 1e-4,
    )
    if args.preset == "tuned":
        # the framework's c3 optimizer (run_quality.py / TrainConfig:
        # adam 5e-3, clipnorm 1, decay_steps=100k i.e. effectively
        # constant over this data's ~7k steps)
        opt = keras.optimizers.Adam(
            learning_rate=args.learning_rate, clipnorm=1.0)
    else:
        lr = keras.optimizers.schedules.ExponentialDecay(
            args.learning_rate, decay_steps=1000, decay_rate=0.96,
            staircase=True
        )
        opt = keras.optimizers.Adagrad(learning_rate=lr, clipnorm=1.0)
    variables = (user_tower.trainable_variables
                 + item_tower.trainable_variables
                 + heads.trainable_variables)

    @tf.function
    def train_step(u, i, r, yy):
        with tf.GradientTape() as tape:
            ue = user_tower(u, training=True)
            ie = item_tower(i, training=True)
            # tfrs.tasks.Retrieval() semantics: CE over U@V.T, diagonal
            # labels, no logQ correction, no accidental-hit masking
            logits = tf.matmul(ue, ie, transpose_b=True)
            labels = tf.range(tf.shape(u)[0])
            retr = tf.reduce_mean(
                tf.nn.sparse_softmax_cross_entropy_with_logits(
                    labels=labels, logits=logits))
            r_pred, c_pred = heads(tf.concat([ue, ie], axis=1), training=True)
            mse = tf.reduce_mean(tf.square(r_pred[:, 0] - r))
            w = tf.where(yy >= 0.5, w_pos, w_neg)
            eps = 1e-7
            c = tf.clip_by_value(c_pred[:, 0], eps, 1 - eps)
            bce = tf.reduce_sum(
                w * -(yy * tf.math.log(c) + (1 - yy) * tf.math.log(1 - c))
            ) / tf.reduce_sum(w)
            reg = tf.add_n(heads.losses) if heads.losses else 0.0
            loss = (retr + args.rating_weight * mse
                    + args.ctr_weight * bce + reg)
        grads = tape.gradient(loss, variables)
        opt.apply_gradients(zip(grads, variables))
        return loss

    def sampled_recall10(sample=1000):
        """Sampled val recall@10 — the early-stop monitor of the
        framework's c3 recipe (eval_every_epochs=3, patience 6)."""
        vu_ = bundle["val/user_id"].astype(np.int32)
        vm_ = bundle["val/movie_id"].astype(np.int32)
        idx = np.random.default_rng(args.seed).choice(
            len(vu_), min(sample, len(vu_)), replace=False)
        vu_, vm_ = vu_[idx], vm_[idx]
        ie = item_tower.predict(np.arange(n_items, dtype=np.int32),
                                batch_size=512, verbose=0)
        ue = user_tower.predict(vu_, batch_size=512, verbose=0)
        sc = ue @ ie.T
        top = np.argpartition(-sc, 10, axis=1)[:, :10]
        return float(np.mean([vm_[r] in top[r] for r in range(len(vm_))]))

    steps_per_epoch = len(uid) // args.batch_size
    rng = np.random.default_rng(args.seed)
    t0 = time.time()
    last_loss = float("nan")
    best_recall, best_weights, stale = -1.0, None, 0
    epochs_run = 0
    for epoch in range(args.epochs):
        perm = rng.permutation(len(uid))
        te = time.time()
        for s in range(steps_per_epoch):
            sl = perm[s * args.batch_size:(s + 1) * args.batch_size]
            last_loss = float(train_step(
                tf.constant(uid[sl]), tf.constant(mid[sl]),
                tf.constant(rating[sl]), tf.constant(y[sl])))
        epochs_run = epoch + 1
        msg = f"epoch {epoch}: loss={last_loss:.4f} ({time.time() - te:.1f}s)"
        if args.preset == "tuned" and (epoch + 1) % 3 == 0:
            rec = sampled_recall10()
            msg += f" recall@10={rec:.4f}"
            if rec > best_recall:
                best_recall, stale = rec, 0
                best_weights = [
                    [w.numpy() for w in m.weights]
                    for m in (user_tower, item_tower, heads)]
            else:
                stale += 1
                if stale >= 2:  # patience 6 epochs / eval-every-3
                    print(msg + " [early stop]", flush=True)
                    break
        print(msg, flush=True)
    if best_weights is not None:
        # restore_best parity with the framework's early stopping
        for m, ws in zip((user_tower, item_tower, heads), best_weights):
            for var, w in zip(m.weights, ws):
                var.assign(w)
    wall = time.time() - t0
    examples = steps_per_epoch * args.batch_size * epochs_run

    # reference offline eval (src/trainer.py:195-226): sample <=1000 val
    # rows seeded, full brute-force dot, recall@k via argpartition
    vu = bundle["val/user_id"].astype(np.int32)
    vm = bundle["val/movie_id"].astype(np.int32)
    if args.eval_sample and len(vu) > args.eval_sample:
        idx = np.random.default_rng(args.seed).choice(
            len(vu), args.eval_sample, replace=False)
        vu, vm = vu[idx], vm[idx]
    item_embs = item_tower.predict(
        np.arange(n_items, dtype=np.int32), batch_size=512, verbose=0)
    user_embs = user_tower.predict(vu, batch_size=512, verbose=0)
    scores = user_embs @ item_embs.T
    report = {}
    for k in (5, 10, 20, 50):
        top = np.argpartition(-scores, k, axis=1)[:, :k]
        report[f"recall@{k}"] = float(np.mean([
            vm[r] in top[r] for r in range(len(vm))]))
        # the honesty anchor (VERDICT r2 weak #2): recall of a RANDOM
        # ranker is k/catalog — a measured value below ~2 sigma of this
        # floor means the recipe learned nothing retrieval-visible
        floor = k / n_items
        report[f"random_floor@{k}"] = round(floor, 6)
        sigma = (floor * (1 - floor) / len(vm)) ** 0.5
        report[f"beats_random@{k}"] = bool(
            report[f"recall@{k}"] > floor + 2 * sigma)
    if args.filter_seen:
        # second protocol in the same run: mask each eval user's train
        # interactions (the TPU framework's EvalConfig.filter_seen)
        tu, tm = bundle["train/user_id"], bundle["train/movie_id"]
        seen = {}
        for u, m in zip(tu, tm):
            seen.setdefault(int(u), []).append(int(m))
        for r, u in enumerate(vu):
            s = seen.get(int(u))
            if s:
                scores[r, s] = -np.inf
        for k in (5, 10, 20, 50):
            top = np.argpartition(-scores, k, axis=1)[:, :k]
            report[f"filtered_recall@{k}"] = float(np.mean([
                vm[r] in top[r] for r in range(len(vm))]))
    report.update({
        "eval_rows": int(len(vm)),
        "train_wall_time_s": round(wall, 1),
        "examples_per_s_cpu": round(examples / wall, 1),
        "epochs": args.epochs,
        "epochs_run": epochs_run,
        "best_sampled_recall10": best_recall if best_recall >= 0 else None,
        "final_loss": last_loss,
        "config": vars(args),
        "note": "reference-equivalent TF/Keras run on CPU (tfrs/faiss "
                "not installed; Retrieval task reproduced as in-batch "
                "softmax CE, eval reproduced as brute-force dot)",
        "tf_version": tf.__version__,
    })
    print(json.dumps(report, indent=2))
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
