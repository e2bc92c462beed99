"""Worker for tests/test_multihost.py: one of two cooperating processes.

Each process owns 4 virtual CPU devices; together they form a global
8-device data-parallel mesh (the TPU-native analog of the reference's
2-machine x 4-GPU launch, detectron2/detectron2/engine/launch.py:27-123).
The worker builds its RANK-STRIDED share of the index stream
(data/build.py:training_index_stream), assembles the global batch from
process-local shards exactly like Stage1Trainer's place()
(engine/trainer.py), runs ONE full stage-1 train step (grad psum crosses
the process boundary over gloo), and prints a JSON line with the indices
it consumed plus a replicated-params checksum for the parent to verify.

Usage: python _multihost_worker.py <coordinator_port> <process_id> [mode]

mode "stage1" (default) runs the OICR+ multi-view step; mode "ssod" runs one
full stage-3 semisup step (EMA teacher update, teacher inference on weak
unlabeled, pseudo-box thresholding, student update over label + unlabel
streams) — the reference's actual 8-GPU stage-2/3 workload
(unbias/ubteacher/engine/trainer.py:436-541) — and checks that the two
hosts consumed disjoint label AND unlabel rank-strided streams and ended
with identical replicated student + teacher params.
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

# the axon sitecustomize registers the TPU plugin whenever this is set,
# overriding JAX_PLATFORMS=cpu (see __graft_entry__._reexec_on_virtual_cpu_mesh)
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_compilation")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.3")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)
jax.config.update("jax_cpu_collectives_implementation", "gloo")
# env vars above are a no-op here — the container pre-imports jax via a site
# hook before this file's os.environ lines run (see
# sos_wsod_tpu/utils/compile_cache.py); push the cache through jax.config so
# the ~15-min 2-process semisup compile is paid once, not per test run
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_compilation")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)


def main():
    port, pid = int(sys.argv[1]), int(sys.argv[2])
    mode = sys.argv[3] if len(sys.argv) > 3 else "stage1"
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid
    )
    assert jax.process_count() == 2 and jax.process_index() == pid
    assert len(jax.local_devices()) == 4 and len(jax.devices()) == 8
    if mode == "ssod":
        run_ssod(pid)
        return
    assert mode == "stage1", mode

    import itertools

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from __graft_entry__ import _tiny_image_batch
    from sos_wsod_tpu.data.build import training_index_stream
    from sos_wsod_tpu.engine.trainer import make_stage1_train_step
    from sos_wsod_tpu.models.meta.rcnn_wsl import MultiInputRCNN
    from sos_wsod_tpu.solver.build import torch_sgd, warmup_multistep_lr

    # rank-strided stream (process_index/count default from the jax runtime)
    n_images, local_bs = 32, 4
    stream = training_index_stream(n_images, seed=0)
    indices = list(itertools.islice(stream, local_bs))

    # per-image data derived from the INDEX: hosts build different images
    samples = [_tiny_image_batch(np.random.RandomState(1000 + i),
                                 p=32, h1=48, w1=64, h2=64, w2=80)
               for i in indices]
    local = jax.tree_util.tree_map(lambda *xs: np.stack(xs), *samples)

    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    model = MultiInputRCNN(num_classes=20, seed_cap=32, dan_dims=(64, 64))
    one = jax.tree_util.tree_map(lambda x: x[0], local)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        one, train=True,
    )["params"]
    tx = torch_sgd(warmup_multistep_lr(1e-3, (100,)), momentum=0.9)
    state = {"params": params, "opt_state": tx.init(params),
             "iter": jnp.zeros((), jnp.int32)}
    repl = NamedSharding(mesh, P())
    state = jax.tree_util.tree_map(lambda x: jax.device_put(x, repl), state)

    # global batch from process-local shards — Stage1Trainer's place() path
    sh = NamedSharding(mesh, P("data"))
    batch = jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
        local)

    step = make_stage1_train_step(model, tx, mesh=mesh, donate=False)
    # AOT-compile, then BARRIER before executing: gloo's context formation
    # (first collective) has a hard 30 s KV timeout, and on a single-core
    # host the two processes' concurrent compiles can finish more than 30 s
    # apart — execution must start in lockstep, compile time must not count.
    step_c = step.lower(state, batch, jax.random.PRNGKey(2)).compile()
    from jax._src.distributed import global_state  # test-only barrier

    global_state.client.wait_at_barrier("compiled",
                                        timeout_in_ms=20 * 60 * 1000)
    new_state, metrics = step_c(state, batch, jax.random.PRNGKey(2))
    jax.block_until_ready(new_state)

    # params are replicated: a checksum over addressable shards must agree
    # across hosts iff the grad psum crossed the process boundary correctly
    leaves = jax.tree_util.tree_leaves(new_state["params"])
    checksum = float(sum(
        jnp.sum(jnp.abs(jnp.asarray(leaf.addressable_data(0), jnp.float32)))
        for leaf in leaves))

    # exercise process_gather's REAL multi-host branch (pickle/pad/allgather;
    # the reference analog is comm.gather in the evaluators) — single-process
    # tests only ever hit its identity short-circuit. Payloads are asymmetric
    # in size so the pad-to-max path is actually used.
    from sos_wsod_tpu.parallel.mesh import process_gather

    mine = [{"rank": pid, "blob": "x" * (10 + 500 * pid)}]
    gathered = process_gather(mine)

    print(json.dumps({
        "pid": pid,
        "indices": indices,
        "checksum": checksum,
        "total_loss": float(metrics["total_loss"]),
        "gathered_ranks": sorted(g["rank"] for g in gathered),
        "gathered_sizes": sorted(len(g["blob"]) for g in gathered),
    }), flush=True)


def run_ssod(pid: int):
    """One 2-process semisup (stage-3) step on the global 8-device mesh."""
    import itertools

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from sos_wsod_tpu.data.build import training_index_stream
    from sos_wsod_tpu.engine.ubteacher import make_semisup_step
    from sos_wsod_tpu.models.meta.rcnn import GeneralizedRCNN
    from sos_wsod_tpu.solver.build import torch_sgd, warmup_multistep_lr

    # disjoint rank-strided label/unlabel streams — the semisup loaders'
    # sharding contract (data/mapper_twocrop.py:227-235)
    n_label, n_unlabel, local_bs = 24, 40, 4
    label_idx = list(itertools.islice(
        training_index_stream(n_label, seed=0), local_bs))
    unlabel_idx = list(itertools.islice(
        training_index_stream(n_unlabel, seed=1), local_bs))

    def image_sample(rng, g=8):
        h = w = 64
        gt_boxes = np.zeros((g, 4), np.float32)
        gt_classes = np.zeros((g,), np.int32)
        gt_valid = np.zeros((g,), bool)
        for i in range(2):
            x1, y1 = rng.uniform(0, w - 20, 2)
            gt_boxes[i] = [x1, y1, x1 + 15, y1 + 15]
            gt_classes[i] = rng.randint(20)
            gt_valid[i] = True
        return {
            "image": rng.uniform(0, 255, (h, w, 3)).astype(np.float32),
            "image_hw": np.array([h, w], np.float32),
            "gt_boxes": gt_boxes, "gt_classes": gt_classes,
            "gt_valid": gt_valid,
            "multi_label_oh": np.ones(20, np.float32),
        }

    def stack(samples):
        return jax.tree_util.tree_map(lambda *xs: np.stack(xs), *samples)

    # per-image data derived from the INDEX (hosts build different images);
    # q/k crops of one index share the base seed like the two-crop mapper
    local = {
        "label_q": stack([image_sample(np.random.RandomState(2000 + i))
                          for i in label_idx]),
        "label_k": stack([image_sample(np.random.RandomState(3000 + i))
                          for i in label_idx]),
        "unlabel_q": stack([image_sample(np.random.RandomState(4000 + i))
                            for i in unlabel_idx]),
        "unlabel_k": stack([image_sample(np.random.RandomState(5000 + i))
                            for i in unlabel_idx]),
    }

    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    rpn_kw = dict(pre_nms_topk_train=64, post_nms_topk_train=32,
                  pre_nms_topk_test=64, post_nms_topk_test=32)
    roi_kw = dict(batch_size_per_image=32, fc_dim=64, detections_per_image=8)
    model = GeneralizedRCNN(num_classes=20, depth=14, fpn_out_channels=64,
                            rpn_kw=rpn_kw, roi_kw=roi_kw)
    one = jax.tree_util.tree_map(lambda x: x[0], local["label_k"])
    params = model.init(jax.random.PRNGKey(0), one,
                        jax.random.PRNGKey(1))["params"]
    tx = torch_sgd(warmup_multistep_lr(0.01, (100,)), momentum=0.9)
    state = {
        "params": params,
        "teacher_params": jax.tree_util.tree_map(lambda x: x + 0.5, params),
        "opt_state": tx.init(params),
        "iter": jnp.ones((), jnp.int32),  # past burn-in: EMA + pseudo path
    }
    repl = NamedSharding(mesh, P())
    state = jax.tree_util.tree_map(lambda x: jax.device_put(x, repl), state)

    sh = NamedSharding(mesh, P("data"))
    batch = jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
        local)

    step = make_semisup_step(
        model, tx, unsup_loss_weight=2.0, ema_keep_rate=0.9996,
        bbox_threshold=0.7, has_multi_label=True, burn_up_step=0,
        pseudo_cap=8, mesh=mesh, donate=False,
    )
    step_c = step.lower(state, batch, jax.random.PRNGKey(2)).compile()
    from jax._src.distributed import global_state  # test-only barrier

    global_state.client.wait_at_barrier("ssod_compiled",
                                        timeout_in_ms=20 * 60 * 1000)
    new_state, metrics = step_c(state, batch, jax.random.PRNGKey(2))
    jax.block_until_ready(new_state)

    def checksum(tree):
        return float(sum(
            jnp.sum(jnp.abs(jnp.asarray(leaf.addressable_data(0),
                                        jnp.float32)))
            for leaf in jax.tree_util.tree_leaves(tree)))

    print(json.dumps({
        "pid": pid,
        "label_indices": label_idx,
        "unlabel_indices": unlabel_idx,
        "student_checksum": checksum(new_state["params"]),
        "teacher_checksum": checksum(new_state["teacher_params"]),
        "total_loss": float(metrics["total_loss"]),
        "num_pseudo": float(metrics["num_pseudo_boxes"]),
    }), flush=True)


if __name__ == "__main__":
    main()
