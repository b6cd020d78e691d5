"""Model tests: U-Net, discriminators, GRL, domain wrapper, state_dict.

Reference surfaces: smp.Unet instantiation (reference
src/test_system.py:90-95), DomainDiscriminator
(src/models/discriminator.py), gradient reversal + UDA model
(src/models/uda.py), DomainAdaptationModel (src/models/domain_model.py).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.conftest import BATCH, CLASSES, SIZE

RNG = np.random.default_rng(0)


def test_unet_forward_shape(seg_bundle, batch):
    images, _ = batch
    from uda_aerial_semantic_segmentation_research_tpu.ops.augment import (
        normalize_images,
    )

    logits = seg_bundle(normalize_images(jnp.asarray(images)))
    assert logits.shape == (BATCH, SIZE, SIZE, CLASSES)
    assert logits.dtype == jnp.float32


def test_unet_encoder_pyramid(seg_bundle, batch):
    images, _ = batch
    feats = seg_bundle.module.apply(
        seg_bundle.variables, jnp.asarray(images, jnp.float32), train=False,
        method=seg_bundle.module.encode)
    # smp-style 6-level pyramid: identity, /2, /4, /8, /16, /32
    assert len(feats) == 6
    assert feats[0].shape[1] == SIZE
    for i, f in enumerate(feats[1:], 1):
        assert f.shape[1] == SIZE // (2 ** i)
    # resnet18 channel signature
    assert [f.shape[-1] for f in feats] == [3, 64, 64, 128, 256, 512]


def test_discriminator_output(disc_bundle, batch):
    images, _ = batch
    probs = disc_bundle(jnp.asarray(images, jnp.float32))
    assert probs.shape == (BATCH, 1)
    p = np.asarray(probs)
    assert np.all((p >= 0) & (p <= 1)), "default output must be probabilities"
    logits = disc_bundle(jnp.asarray(images, jnp.float32), return_logits=True)
    np.testing.assert_allclose(np.asarray(jax.nn.sigmoid(logits)), p, atol=1e-5)


def test_gradient_reversal_vjp():
    """GRL: identity forward, -alpha-scaled cotangent backward
    (reference src/models/uda.py:99-112)."""
    from uda_aerial_semantic_segmentation_research_tpu.models.uda import (
        gradient_reverse_layer,
    )

    x = jnp.asarray(RNG.normal(size=(4, 3)).astype(np.float32))
    y = gradient_reverse_layer(x, 2.0)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x))

    g = jax.grad(lambda v: jnp.sum(gradient_reverse_layer(v, 2.0) ** 2))(x)
    expected = -2.0 * (2.0 * np.asarray(x))  # -alpha * d(sum x^2)/dx
    np.testing.assert_allclose(np.asarray(g), expected, atol=1e-5)


def test_state_dict_roundtrip(seg_bundle):
    sd = seg_bundle.state_dict()
    assert all(isinstance(v, np.ndarray) for v in sd.values())
    assert any("stem_conv" in k for k in sd)

    perturbed = {k: v + 1.0 if v.dtype.kind == "f" else v for k, v in sd.items()}
    seg_bundle.load_state_dict(perturbed)
    sd2 = seg_bundle.state_dict()
    key = next(k for k in sd if sd[k].dtype.kind == "f")
    np.testing.assert_allclose(sd2[key], sd[key] + 1.0)
    seg_bundle.load_state_dict(sd)  # restore for other tests

    with pytest.raises(ValueError):
        seg_bundle.load_state_dict({"bogus": np.zeros(1)}, strict=True)


def test_domain_adaptation_model(seg_bundle, disc_bundle, batch):
    from uda_aerial_semantic_segmentation_research_tpu.models.domain_model import (
        DomainAdaptationModel,
    )

    images, _ = batch
    dm = DomainAdaptationModel(seg_bundle, disc_bundle)
    x = jnp.asarray(images, jnp.float32)
    seg_only = dm(x)
    assert seg_only.shape == (BATCH, SIZE, SIZE, CLASSES)
    seg, domain = dm(x, domain_adaptation=True)
    assert seg.shape == (BATCH, SIZE, SIZE, CLASSES)
    assert domain.shape == (BATCH, 1)

    feats = dm.get_features(x)
    assert feats.shape[-1] == 512  # resnet18 bottleneck

    sd = dm.state_dict()
    assert any(k.startswith("segmentation_model/") for k in sd)
    assert any(k.startswith("discriminator/") for k in sd)
    dm.load_state_dict(sd)


def test_uda_model_grl_forward():
    from uda_aerial_semantic_segmentation_research_tpu.models import (
        create_uda_model,
    )

    bundle = create_uda_model(encoder_name="resnet18", classes=CLASSES,
                              image_size=SIZE, dtype=jnp.float32)
    x = jnp.asarray(RNG.normal(size=(2, SIZE, SIZE, 3)).astype(np.float32))
    seg = bundle(x)
    assert seg.shape == (2, SIZE, SIZE, CLASSES)
    seg, dom = bundle(x, domain_adaptation=True, alpha=0.5)
    assert dom.shape == (2, 1)


def test_unknown_encoder_raises():
    from uda_aerial_semantic_segmentation_research_tpu.models.resnet import (
        build_encoder,
    )

    with pytest.raises(ValueError):
        build_encoder("vgg16")


def test_pretrained_converter_maps_keys(seg_bundle):
    """convert_torch_resnet must produce keys matching our encoder tree."""
    torch = pytest.importorskip("torch")
    from uda_aerial_semantic_segmentation_research_tpu.models.pretrained import (
        convert_torch_resnet,
    )

    # build a fake torchvision-style resnet18 state dict with right shapes
    sd = {"conv1.weight": torch.zeros(64, 3, 7, 7),
          "bn1.weight": torch.zeros(64), "bn1.bias": torch.zeros(64),
          "bn1.running_mean": torch.zeros(64), "bn1.running_var": torch.ones(64)}
    chans = [64, 128, 256, 512]
    for s, c in enumerate(chans):
        in_c = 64 if s == 0 else chans[s - 1]
        for b in range(2):
            p = f"layer{s + 1}.{b}"
            sd[f"{p}.conv1.weight"] = torch.zeros(c, in_c if b == 0 else c, 3, 3)
            sd[f"{p}.conv2.weight"] = torch.zeros(c, c, 3, 3)
            for i in (1, 2):
                sd[f"{p}.bn{i}.weight"] = torch.zeros(c)
                sd[f"{p}.bn{i}.bias"] = torch.zeros(c)
                sd[f"{p}.bn{i}.running_mean"] = torch.zeros(c)
                sd[f"{p}.bn{i}.running_var"] = torch.ones(c)
            if b == 0 and s > 0:
                sd[f"{p}.downsample.0.weight"] = torch.zeros(c, in_c, 1, 1)
                sd[f"{p}.downsample.1.weight"] = torch.zeros(c)
                sd[f"{p}.downsample.1.bias"] = torch.zeros(c)
                sd[f"{p}.downsample.1.running_mean"] = torch.zeros(c)
                sd[f"{p}.downsample.1.running_var"] = torch.ones(c)

    flat = convert_torch_resnet(sd, "resnet18")
    assert "stem_conv/kernel" in flat
    assert flat["stem_conv/kernel"].shape == (7, 7, 3, 64)  # OIHW -> HWIO

    # every converted param key must exist in the bundle's encoder subtree
    own = seg_bundle.state_dict()
    enc_prefix = next(k.split("stem_conv")[0] for k in own
                      if "/stem_conv/" in k and k.startswith("params/"))
    bs_prefix = enc_prefix.replace("params/", "batch_stats/", 1)
    for k in flat:
        kk = (bs_prefix + k[len("batch_stats::"):]
              if k.startswith("batch_stats::") else enc_prefix + k)
        assert kk in own, f"converted key {kk} not in model"


@pytest.mark.parametrize("name", ["FPN", "PSPNet", "Linknet", "DeepLabV3Plus",
                                  "UnetPlusPlus", "PAN", "MAnet"])
def test_architecture_families(name, batch):
    """By-name factory parity with the reference's getattr(smp, name)
    instantiation (reference src/models/train.py:570-576)."""
    from uda_aerial_semantic_segmentation_research_tpu.models import create_model
    from uda_aerial_semantic_segmentation_research_tpu.ops.augment import (
        normalize_images,
    )

    images, _ = batch
    bundle = create_model(model_name=name, encoder_name="resnet18",
                          classes=CLASSES, image_size=SIZE,
                          dtype=jnp.float32)
    logits = bundle(normalize_images(jnp.asarray(images)))
    assert logits.shape == (BATCH, SIZE, SIZE, CLASSES)
    assert logits.dtype == jnp.float32
    assert bool(jnp.isfinite(logits).all())
    # encoder pyramid exposed for the DA wrappers
    feats = bundle.module.apply(bundle.variables,
                                jnp.asarray(images, jnp.float32),
                                train=False, method=bundle.module.encode)
    assert len(feats) == 6


def test_create_model_unknown_name():
    from uda_aerial_semantic_segmentation_research_tpu.models import create_model

    with pytest.raises(ValueError):
        create_model(model_name="SegFormer")


def test_fused_decoder_matches_naive(batch):
    """The phase-decomposed decoder conv1 must equal the naive
    upsample+concat+conv path with the SAME variables (checkpoints are
    interchangeable)."""
    from uda_aerial_semantic_segmentation_research_tpu.models.unet import Unet
    from uda_aerial_semantic_segmentation_research_tpu.ops.augment import (
        normalize_images,
    )

    images, _ = batch
    x = normalize_images(jnp.asarray(images))
    fused = Unet(encoder_name="resnet18", classes=CLASSES,
                 dtype=jnp.float32, fused_decoder=True)
    naive = Unet(encoder_name="resnet18", classes=CLASSES,
                 dtype=jnp.float32, fused_decoder=False)
    variables = fused.init(jax.random.key(0), jnp.zeros((1, SIZE, SIZE, 3)))
    y_f = fused.apply(variables, x)
    y_n = naive.apply(variables, x)  # identical param tree by construction
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_n),
                               atol=2e-4, rtol=1e-4)


def test_dilated_decoder_matches_naive(batch):
    """The lhs_dilation=2 tap-folded decoder (fused_decoder="dilated",
    the TPU production default since r3) must equal the naive
    upsample+concat+conv path with the SAME variables."""
    from uda_aerial_semantic_segmentation_research_tpu.models.unet import Unet
    from uda_aerial_semantic_segmentation_research_tpu.ops.augment import (
        normalize_images,
    )

    images, _ = batch
    x = normalize_images(jnp.asarray(images))
    dil = Unet(encoder_name="resnet18", classes=CLASSES,
               dtype=jnp.float32, fused_decoder="dilated")
    naive = Unet(encoder_name="resnet18", classes=CLASSES,
                 dtype=jnp.float32, fused_decoder=False)
    variables = dil.init(jax.random.key(0), jnp.zeros((1, SIZE, SIZE, 3)))
    y_d = dil.apply(variables, x)
    y_n = naive.apply(variables, x)  # identical param tree by construction
    np.testing.assert_allclose(np.asarray(y_d), np.asarray(y_n),
                               atol=2e-4, rtol=1e-4)


def test_dilated_upsample_conv_exact():
    """upsample2x_conv3x3_dilated == conv3x3_same(nearest_up2(x)) in f32,
    forward and both gradients (ops/upsample_conv.py tap folding)."""
    from uda_aerial_semantic_segmentation_research_tpu.ops.upsample_conv import (
        upsample2x_conv3x3_dilated,
    )

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(2, 9, 7, 5)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 5, 6)).astype(np.float32))

    def up2(t):
        b, h, ww, c = t.shape
        t = jnp.broadcast_to(t[:, :, None, :, None, :], (b, h, 2, ww, 2, c))
        return t.reshape(b, h * 2, ww * 2, c)

    def ref(x, w):
        return jax.lax.conv_general_dilated(
            up2(x), w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    y = upsample2x_conv3x3_dilated(x, w)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref(x, w)),
                               atol=1e-4, rtol=1e-4)

    gx, gw = jax.grad(lambda x, w: jnp.sum(
        jnp.sin(upsample2x_conv3x3_dilated(x, w))), argnums=(0, 1))(x, w)
    rx, rw = jax.grad(lambda x, w: jnp.sum(jnp.sin(ref(x, w))),
                      argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(rw),
                               atol=1e-4, rtol=1e-4)


def test_packed_conv_matches_lax_conv():
    """conv3x3_packed == lax 3x3 SAME conv, forward and both gradients
    (the 2x2 space-to-depth lane packing is a pure execution-schedule
    change; ops/packed_conv.py)."""
    from uda_aerial_semantic_segmentation_research_tpu.ops.packed_conv import (
        conv3x3_packed,
    )

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(2, 16, 12, 5)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, 5, 7)).astype(np.float32))
    co = jnp.asarray(rng.normal(size=(2, 16, 12, 7)).astype(np.float32))

    def ref_conv(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))

    np.testing.assert_allclose(np.asarray(conv3x3_packed(x, k)),
                               np.asarray(ref_conv(x, k)),
                               atol=1e-5, rtol=1e-5)
    gx_r, gk_r = jax.grad(lambda x, k: (ref_conv(x, k) * co).sum(),
                          argnums=(0, 1))(x, k)
    gx_p, gk_p = jax.grad(lambda x, k: (conv3x3_packed(x, k) * co).sum(),
                          argnums=(0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_r),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gk_p), np.asarray(gk_r),
                               atol=1e-4, rtol=1e-4)


def test_packed_decoder_matches_plain(batch):
    """packed_decoder=True: identical parameter tree AND numerically
    equal forward to the plain Unet (same variables)."""
    from uda_aerial_semantic_segmentation_research_tpu.models.unet import Unet
    from uda_aerial_semantic_segmentation_research_tpu.ops.augment import (
        normalize_images,
    )

    images, _ = batch
    x = normalize_images(jnp.asarray(images))
    packed = Unet(encoder_name="resnet18", classes=CLASSES,
                  dtype=jnp.float32, packed_decoder=True)
    plain = Unet(encoder_name="resnet18", classes=CLASSES,
                 dtype=jnp.float32, packed_decoder=False)
    vp = packed.init(jax.random.key(0), jnp.zeros((1, SIZE, SIZE, 3)))
    vn = plain.init(jax.random.key(0), jnp.zeros((1, SIZE, SIZE, 3)))
    assert (jax.tree.structure(vp["params"])
            == jax.tree.structure(vn["params"]))
    y_p = packed.apply(vp, x)
    y_n = plain.apply(vp, x)
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_n),
                               atol=2e-4, rtol=1e-4)


def test_remat_unet_matches_plain(batch):
    """remat in {True, "encoder", "decoder"}: same parameter tree; one
    supervised train step gives identical loss and updated params
    (rematerialization must be a pure memory/schedule change)."""
    from uda_aerial_semantic_segmentation_research_tpu.models import create_unet
    from uda_aerial_semantic_segmentation_research_tpu.training import (
        steps as step_lib,
    )
    from uda_aerial_semantic_segmentation_research_tpu.training.state import (
        TrainState,
        adam,
    )

    images, masks = batch
    key = jax.random.key(2)
    outs = {}
    for rm in (False, True, "encoder", "decoder"):
        b = create_unet(encoder_name="resnet18", classes=CLASSES,
                        image_size=SIZE, encoder_weights=None,
                        dtype=jnp.float32, remat=rm)
        step = step_lib.make_supervised_train_step(b.module, CLASSES)
        st, m = step(TrainState.from_bundle(b, adam(1e-3)), key,
                     jnp.asarray(images), jnp.asarray(masks))
        outs[rm] = (float(m["loss"]), jax.tree.leaves(st.params))
    for rm in (True, "encoder", "decoder"):
        assert outs[False][0] == pytest.approx(outs[rm][0], abs=1e-6)
        for a, b_ in zip(outs[False][1], outs[rm][1]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       atol=1e-6, rtol=1e-6)


def test_remat_gradients_exact(batch):
    """RAW GRADIENTS under every remat mode (block remat and the
    save-conv-outputs policy modes) match remat=False to float
    precision in f32 on the deterministic CPU backend.  Tighter than
    the one-Adam-step check above: a post-step param comparison is
    ~lr*sign(grad) at step 1 and would pass even with percent-level
    gradient deviations.  (On TPU, remat'd backwards re-round bf16
    intermediates under different fusion schedules, so small deviations
    there are numerics, not algebra — this pins the algebra.)"""
    from uda_aerial_semantic_segmentation_research_tpu.models import create_unet

    images, _ = batch
    x = jnp.asarray(images, jnp.float32) / 255.0
    tgt = jax.random.normal(jax.random.key(7),
                            (BATCH, SIZE, SIZE, CLASSES), jnp.float32)

    def grads_for(rm):
        b = create_unet(encoder_name="resnet18", classes=CLASSES,
                        image_size=SIZE, encoder_weights=None,
                        dtype=jnp.float32, remat=rm)

        def loss_fn(params):
            logits, _ = b.module.apply(
                {"params": params, "batch_stats": b.batch_stats},
                x, train=True, mutable=["batch_stats"])
            return jnp.mean((logits.astype(jnp.float32) - tgt) ** 2)

        return jax.tree.leaves(jax.grad(loss_fn)(b.params))

    base = grads_for(False)
    for rm in (True, "decoder", "convs", "encoder_convs", "decoder_convs",
               "stage1", "stage12"):
        for a, g in zip(base, grads_for(rm)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(g),
                                       atol=1e-6, rtol=1e-5,
                                       err_msg=f"remat={rm}")


def test_mobilenet_v2_encoder(batch):
    """MobileNetV2 encoder: smp-style 6-level pyramid with the
    (3, 16, 24, 32, 96, 1280) channel signature."""
    from uda_aerial_semantic_segmentation_research_tpu.models import create_unet
    from uda_aerial_semantic_segmentation_research_tpu.ops.augment import (
        normalize_images,
    )

    images, _ = batch
    bundle = create_unet(encoder_name="mobilenet_v2", classes=CLASSES,
                         image_size=SIZE, encoder_weights=None,
                         dtype=jnp.float32)
    logits = bundle(normalize_images(jnp.asarray(images)))
    assert logits.shape == (BATCH, SIZE, SIZE, CLASSES)
    feats = bundle.module.apply(bundle.variables,
                                jnp.asarray(images, jnp.float32),
                                train=False, method=bundle.module.encode)
    assert [f.shape[-1] for f in feats] == [3, 16, 24, 32, 96, 1280]
    for i, f in enumerate(feats):
        assert f.shape[1] == SIZE // (2 ** i)
