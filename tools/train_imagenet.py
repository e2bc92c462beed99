"""ImageNet classification pretraining for the WSOD backbones.

Parity target: uwsod/projects/WSL/tools/imagenet.py — pretrains VGG16 /
WS-ResNet trunks for the WSOD stages. TPU-native: one jitted SGD step over a
backbone + global-average-pool + linear classifier; data comes from any
iterator yielding {"image": (B, H, W, 3) float BGR-mean-subtracted,
"label": (B,)} (an ImageFolder-style host loader or synthetic data for smoke
runs: --synthetic).
"""
from __future__ import annotations

import argparse
import time

import numpy as np


def build_model(arch: str, num_classes: int, dtype):
    import flax.linen as nn
    import jax.numpy as jnp

    from sos_wsod_tpu.models.backbones.resnet_ws import WSResNet
    from sos_wsod_tpu.models.backbones.vgg import VGG16

    class Classifier(nn.Module):
        @nn.compact
        def __call__(self, x):
            if arch == "vgg16":
                feats = VGG16(conv5_dilation=1, freeze_at=0, dtype=dtype,
                              name="backbone")(x, None)["plain5"]
            elif arch == "ws_resnet50":
                feats = WSResNet(depth=50, freeze_at=0, res5_dilation=1,
                                 out_features=("res5",), dtype=dtype,
                                 name="backbone")(x)["res5"]
            else:
                raise ValueError(arch)
            pooled = jnp.mean(feats, axis=(1, 2))
            return nn.Dense(num_classes,
                            kernel_init=nn.initializers.normal(0.01),
                            name="linear")(pooled)

    return Classifier()


def make_train_step(model, tx):
    import jax
    import jax.numpy as jnp
    import optax

    def loss_fn(params, batch):
        logits = model.apply({"params": params}, batch["image"])
        labels = batch["label"]
        ce = optax.softmax_cross_entropy_with_integer_labels(
            jnp.asarray(logits, jnp.float32), labels)
        acc = jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32))
        return jnp.mean(ce), acc

    @jax.jit
    def step(state, batch):
        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state["params"], batch)
        updates, opt_state = tx.update(grads, state["opt_state"],
                                       state["params"])
        import optax as _o

        params = _o.apply_updates(state["params"], updates)
        return ({"params": params, "opt_state": opt_state},
                {"loss": loss, "acc": acc})

    return step


def synthetic_batches(batch_size, image_size, num_classes, seed=0):
    rng = np.random.RandomState(seed)
    while True:
        yield {
            "image": rng.rand(batch_size, image_size, image_size, 3)
            .astype(np.float32) * 255 - 120,
            "label": rng.randint(0, num_classes, batch_size),
        }


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--arch", default="vgg16",
                    choices=["vgg16", "ws_resnet50"])
    ap.add_argument("--num-classes", type=int, default=1000)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--image-size", type=int, default=224)
    ap.add_argument("--lr", type=float, default=0.01)
    ap.add_argument("--momentum", type=float, default=0.9)
    ap.add_argument("--weight-decay", type=float, default=5e-4)
    ap.add_argument("--max-iter", type=int, default=100)
    ap.add_argument("--log-period", type=int, default=20)
    ap.add_argument("--synthetic", action="store_true",
                    help="random data (smoke/benchmark run)")
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import optax

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    model = build_model(args.arch, args.num_classes, dtype)
    data = synthetic_batches(args.batch_size, args.image_size,
                             args.num_classes)
    example = next(data)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.asarray(example["image"]))["params"]
    tx = optax.chain(
        optax.add_decayed_weights(args.weight_decay),
        optax.sgd(args.lr, momentum=args.momentum),
    )
    state = {"params": params, "opt_state": tx.init(params)}
    step = make_train_step(model, tx)

    t0 = time.time()
    for it in range(args.max_iter):
        batch = jax.tree_util.tree_map(jnp.asarray, next(data))
        state, metrics = step(state, batch)
        if (it + 1) % args.log_period == 0:
            print(f"iter {it + 1}: loss={float(metrics['loss']):.4f} "
                  f"acc={float(metrics['acc']):.3f} "
                  f"({(it + 1) * args.batch_size / (time.time() - t0):.1f} img/s)")
    return state


if __name__ == "__main__":
    main()
