"""Host augmentation + loader + feature-capture unit tests."""

import numpy as np
import pytest
from PIL import Image

from semiuhpe_tpu.data import augments_host as ah
from semiuhpe_tpu.data.loader import Loader, cycle


class TestNormalize:
    def test_roundtrip(self):
        img = Image.fromarray(
            np.random.default_rng(0).integers(0, 255, (32, 32, 3), np.uint8))
        arr = ah.normalize(img)
        back = ah.denormalize(arr)
        np.testing.assert_allclose(back, np.asarray(img), atol=1)

    def test_mean_std(self):
        gray = Image.new("RGB", (16, 16), (124, 116, 104))  # ~ImageNet mean
        arr = ah.normalize(gray)
        assert np.abs(arr).max() < 0.05


class TestRandomResizedCrop:
    def test_output_size_and_determinism(self):
        img = Image.fromarray(
            np.random.default_rng(0).integers(0, 255, (100, 80, 3), np.uint8))
        out1 = ah.random_resized_crop(np.random.default_rng(7), img, (0.8, 1.25), 64)
        out2 = ah.random_resized_crop(np.random.default_rng(7), img, (0.8, 1.25), 64)
        assert out1.size == (64, 64)
        np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))

    def test_large_scale_falls_back_to_center(self):
        img = Image.fromarray(np.zeros((50, 50, 3), np.uint8))
        out = ah.random_resized_crop(np.random.default_rng(0), img, (2.0, 2.5), 32)
        assert out.size == (32, 32)


class TestViews:
    def test_weak_strong_shapes(self):
        img = Image.fromarray(
            np.random.default_rng(0).integers(0, 255, (64, 64, 3), np.uint8))
        weak, strong, angle = ah.weak_strong_views(
            np.random.default_rng(0), img, augment_strong=True,
            rotate_aug=True, out_size=64)
        assert weak.shape == (64, 64, 3)
        assert strong.shape == (64, 64, 3)
        assert -30 <= angle <= 30

    def test_no_strong_when_disabled(self):
        img = Image.fromarray(np.zeros((64, 64, 3), np.uint8))
        weak, strong, angle = ah.weak_strong_views(
            np.random.default_rng(0), img, augment_strong=False, out_size=64)
        assert strong is None and angle == 0.0


class _ToyDataset:
    def __len__(self):
        return 10

    def __getitem__(self, i):
        return {"idx": np.int32(i), "x": np.full((4,), i, np.float32)}


class TestLoader:
    def test_batching_drop_last(self):
        ld = Loader(_ToyDataset(), 4, shuffle=False, drop_last=True,
                    num_workers=2)
        batches = list(ld)
        assert len(batches) == 2
        assert batches[0]["x"].shape == (4, 4)
        np.testing.assert_array_equal(batches[0]["idx"], [0, 1, 2, 3])

    def test_keep_last(self):
        ld = Loader(_ToyDataset(), 4, shuffle=False, drop_last=False,
                    num_workers=2)
        batches = list(ld)
        assert len(batches) == 3
        assert batches[-1]["x"].shape == (2, 4)

    def test_cycle_restarts(self):
        ld = Loader(_ToyDataset(), 5, shuffle=False, drop_last=True,
                    num_workers=1)
        it = cycle(ld)
        seen = [next(it)["idx"][0] for _ in range(4)]
        assert seen == [0, 5, 0, 5]


class TestFeatureCapture:
    def test_penultimate_feature_shape(self):
        import jax
        import jax.numpy as jnp

        from semiuhpe_tpu.models import build_network
        from semiuhpe_tpu.training import steps as steps_mod
        from semiuhpe_tpu.training.state import create_train_state

        net = build_network("tiny")
        state = create_train_state(net, jax.random.key(0), (16, 16, 3), 1e-3)
        fn = jax.jit(steps_mod.make_feature_entropy_fn(net))
        e, f = fn(state, jnp.zeros((4, 16, 16, 3)))
        assert e.shape == (4,)
        # tiny head: hidden (32,) -> penultimate Dense output is 32-dim.
        assert f.shape == (4, 32)

    def test_nested_dense_backbone_still_finds_head_feature(self):
        """The feature comes from RegressionHead's explicit sown handle —
        a backbone with its own (nested, non-head) Dense layers must not
        confuse it (round-2 fragility: name-substring + sorted-Dense
        indexing)."""
        import flax.linen as nn
        import jax
        import jax.numpy as jnp

        from semiuhpe_tpu.models.layers import RegressionHead
        from semiuhpe_tpu.training import steps as steps_mod
        from semiuhpe_tpu.training.state import create_train_state

        class SEBlock(nn.Module):
            @nn.compact
            def __call__(self, x):
                # Two nested non-head Dense layers (an SE-style gate).
                s = nn.Dense(8)(x)
                s = nn.Dense(x.shape[-1])(nn.relu(s))
                return x * nn.sigmoid(s)

        class NestedNet(nn.Module):
            @nn.compact
            def __call__(self, x, train: bool = True):
                x = jnp.mean(x, axis=(1, 2))
                x = nn.Dense(24)(x)     # trunk Dense
                x = SEBlock()(x)        # nested Dense pair
                return RegressionHead((48, 12), 9)(x, train)

        net = NestedNet()
        state = create_train_state(net, jax.random.key(0), (8, 8, 3), 1e-3)
        e, f = jax.jit(steps_mod.make_feature_entropy_fn(net))(
            state, jnp.zeros((2, 8, 8, 3)))
        # Must be the head's LAST hidden Dense (12), not the trunk (24),
        # the SE gates (8/24), or the head's first hidden (48).
        assert f.shape == (2, 12)
        assert e.shape == (2,)

    def test_headless_backbone_fails_loudly(self):
        import flax.linen as nn
        import jax
        import jax.numpy as jnp
        import pytest

        from semiuhpe_tpu.training import steps as steps_mod
        from semiuhpe_tpu.training.state import create_train_state

        class NoHead(nn.Module):
            @nn.compact
            def __call__(self, x, train: bool = True):
                return nn.Dense(9)(jnp.mean(x, axis=(1, 2)))

        net = NoHead()
        state = create_train_state(net, jax.random.key(0), (8, 8, 3), 1e-3)
        with pytest.raises(ValueError, match="penultimate_feature"):
            steps_mod.make_feature_entropy_fn(net)(
                state, jnp.zeros((2, 8, 8, 3)))


class TestProcessLoader:
    def test_process_pool_batches(self):
        ld = Loader(_ToyDataset(), 4, shuffle=False, drop_last=True,
                    num_workers=2, use_processes=True)
        batches = list(ld)
        assert len(batches) == 2
        np.testing.assert_array_equal(batches[0]["idx"], [0, 1, 2, 3])
