import os

from datr_tpu.config import apply_overrides, load_config, parse_override

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_base_inheritance_c2f():
    cfg = load_config(
        os.path.join(ROOT, "configs/DA/Cityscapes2FoggyCityscapes/"
                     "DINO_4scale_C2F.py")
    )
    assert cfg.num_classes == 9  # override
    assert cfg.hidden_dim == 256  # inherited
    assert cfg.data_aug_max_size == 2048  # C2F-specific
    assert cfg.da_backbone_loss_coef == 0.1
    assert cfg.pseudo_label_threshold == 0.3
    assert cfg.lr == 1e-4


def test_overrides():
    cfg = load_config(os.path.join(ROOT, "configs/DINO/DINO_4scale.py"))
    cfg2 = apply_overrides(cfg, ["lr=0.001", "backbone=resnet101",
                                 "use_dn=False"])
    assert cfg2.lr == 0.001
    assert cfg2.backbone == "resnet101"
    assert cfg2.use_dn is False
    assert cfg.lr == 1e-4  # original untouched


def test_parse_override_nested():
    assert parse_override("a.b.c=[1,2]") == {"a": {"b": {"c": [1, 2]}}}
    assert parse_override("name=foo") == {"name": "foo"}


def test_parse_override_bool_words():
    """Reference DictAction (slconfig.py:425-429): TRUE/FALSE/none words are
    case-insensitive bools/None — scripts pass embed_init_tgt=TRUE, and
    FALSE must not become a truthy string."""
    assert parse_override("a=TRUE") == {"a": True}
    assert parse_override("a=FALSE") == {"a": False}
    assert parse_override("a=null") == {"a": None}
    assert parse_override("a=True") == {"a": True}  # literal_eval path
