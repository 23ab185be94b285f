"""Dataset registry — the counterpart of the reference's per-dataset
``get_dataloader_<NAME>`` functions (SURVEY.md §2.6)."""

from semiuhpe_tpu.data.datasets.base import SyntheticHeadPose  # noqa: F401


def get_dataset(name: str, phase: str, config):
    name = name.lower()
    if name == "300wlp":
        from semiuhpe_tpu.data.datasets.d300wlp import make_300wlp
        return make_300wlp(phase, config)
    if name == "aflw2000":
        from semiuhpe_tpu.data.datasets.aflw2000 import make_aflw2000
        return make_aflw2000(phase, config)
    if name == "dad3dheads":
        from semiuhpe_tpu.data.datasets.dad3dheads import make_dad3dheads
        return make_dad3dheads(phase, config)
    if name == "cocohead":
        from semiuhpe_tpu.data.datasets.cocohead import make_cocohead
        return make_cocohead(phase, config)
    if name == "wildhead":
        from semiuhpe_tpu.data.datasets.wildhead import make_wildhead
        return make_wildhead(phase, config)
    if name == "crowdhuman":
        from semiuhpe_tpu.data.datasets.crowdhuman import make_crowdhuman
        return make_crowdhuman(phase, config)
    if name == "widerface":
        from semiuhpe_tpu.data.datasets.widerface import make_widerface
        return make_widerface(phase, config)
    if name == "aflwface":
        from semiuhpe_tpu.data.datasets.aflwface import make_aflwface
        return make_aflwface(phase, config)
    if name in ("biwitrain", "biwitest"):
        from semiuhpe_tpu.data.datasets.biwi import make_biwi
        return make_biwi(name, phase, config)
    if name == "synthetic":
        total = getattr(config, "synthetic_size", 512)
        ss_ratio = getattr(config, "ss_ratio", 1.0)
        # Semi-supervised split: 'train' = first ss_ratio fraction,
        # 'ulb_train' = disjoint complement; 'test' = a different seed.
        n_labeled = max(1, int(total * ss_ratio))
        if phase == "train":
            n, offset = n_labeled, 0
        elif phase == "ulb_train":
            n, offset = max(1, total - n_labeled), n_labeled
        elif phase == "test":
            n = getattr(config, "synthetic_test_size", 0) or total
            offset = 0
        else:  # train_all
            n, offset = total, 0
        return SyntheticHeadPose(
            n=n, offset=offset,
            augment_strong=(phase == "ulb_train"),
            rotate_aug=getattr(config, "rotate_aug", False),
            full_range=getattr(config, "is_full_range", False),
            seed=0 if phase != "test" else 1,
            size=getattr(config, "input_size", 224),
            # Device-views mode ships raw uint8 crops everywhere.  For the
            # test phase the raw crop IS the whole deterministic test
            # transform (the reference applies no stochastic views at
            # test), so the eval step just normalizes it on device — and
            # the set becomes packable/stageable as uint8.
            raw_views=(phase in ("train", "train_all", "ulb_train", "test")
                       and getattr(config, "device_views", False)),
            # Test transform is deterministic (plain normalize) in BOTH
            # modes: with device_views the raw crop is normalized on
            # device; without, eval_transform skips the stochastic weak
            # view so metrics agree across the flag.
            eval_transform=(phase == "test"),
        )
    raise NotImplementedError(f"unknown dataset {name}")
