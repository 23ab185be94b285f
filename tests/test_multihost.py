"""Multi-host helpers in single-process mode + detector TTA."""

import jax
import jax.numpy as jnp
import numpy as np


class TestMultihostSingleProcess:
    def test_global_mesh_and_batch_assembly(self):
        from semiuhpe_tpu.parallel import multihost

        mesh = multihost.global_mesh()
        assert len(mesh.devices.ravel()) == 8
        batch = {"img": np.arange(16 * 4, dtype=np.float32).reshape(16, 4)}
        global_batch = multihost.shard_global_batch(mesh, batch)
        assert global_batch["img"].shape == (16, 4)
        # Values preserved through the device_put assembly.
        np.testing.assert_array_equal(
            np.asarray(global_batch["img"]), batch["img"])
        assert multihost.is_main_process()


class TestDetectorTTA:
    def test_flip_merge_doubles_candidates(self):
        from semiuhpe_tpu.detect import yolov5_bpjdet
        from semiuhpe_tpu.detect.model import tta_forward

        model = yolov5_bpjdet("s6")
        x = jnp.zeros((1, 128, 128, 3))
        v = model.init({"params": jax.random.key(0)}, x, train=False)
        plain = np.asarray(model.apply(v, x, train=False))
        tta = tta_forward(model, v, x, scales=(1.0, 1.0), flips=(None, 3))
        assert tta.shape[1] == 2 * plain.shape[1]
        # First half equals the un-augmented forward.
        np.testing.assert_allclose(tta[:, :plain.shape[1]], plain, atol=1e-5)
        # Flipped half: x-centers mirrored into the same range.
        assert tta[:, plain.shape[1]:, 0].min() > -64
        assert tta[:, plain.shape[1]:, 0].max() < 192
