"""CLI flow tests: the three scripts/*.sh paths through datr_tpu.main.

Covers the round-1 latent crash: scripts/DINO_train_self_training.sh loads
--pretrain_model_path runs/.../best_ema_teacher, which BestTracker saved as a
params-only tree; load_pretrain_params must accept both that and a full
TrainState checkpoint (reference semantics: main.py:247-271 pretrain load,
main_teacher.py:234,311 resume-student-from-ema).
"""

import json
import os

import pytest

from datr_tpu.main import get_args_parser, main

TINY_CFG = """
_base_ = ["{base}"]
num_classes = 5
dn_labelbook_size = 5
hidden_dim = 32
nheads = 2
enc_layers = 1
dec_layers = 2
dim_feedforward = 64
num_queries = 16
dn_number = 4
dn_single_pad = 4
canvas_h = 96
canvas_w = 128
max_boxes = 8
batch_size = 2
epochs = 1
lr_drop = 40
synthetic_images = 4
use_remat = False
data_aug_scales = [72, 80]
data_aug_max_size = 120
data_aug_scales2_resize = [64, 72]
data_aug_scales2_crop = [48, 72]
num_select = 10
dataset_file = "city2foggy"
burn_epochs = 40
pseudo_label_threshold = 0.05
ema_decay_teacher = 0.9
ema_decay_best_model = 0.5
"""


def _write_cfg(tmp_path, **overrides):
    base = os.path.abspath("configs/DINO/DINO_4scale.py")
    cfg = TINY_CFG.format(base=base)
    for k, v in overrides.items():
        cfg += f"\n{k} = {v!r}\n"
    p = tmp_path / "tiny_cfg.py"
    p.write_text(cfg)
    return str(p)


def _run(cfg_path, out_dir, *extra):
    parser = get_args_parser()
    args = parser.parse_args([
        "-c", cfg_path, "--output_dir", str(out_dir), "--synthetic",
        "--debug", *extra,
    ])
    main(args)


@pytest.mark.slow
def test_burnin_then_self_training_relaunch(tmp_path):
    cfg = _write_cfg(tmp_path)
    burn_dir = tmp_path / "burn"
    _run(cfg, burn_dir)
    # burn-in run wrote the best families + rolling checkpoint
    assert (burn_dir / "best_ema_teacher").is_dir()
    assert (burn_dir / "checkpoint").is_dir()
    assert (burn_dir / "log.txt").exists()

    # relaunch exactly like scripts/DINO_train_self_training.sh: pretrain
    # from the params-only best_ema_teacher tree, burn_epochs=0
    st_dir = tmp_path / "st"
    _run(
        cfg, st_dir,
        "--pretrain_model_path", str(burn_dir / "best_ema_teacher"),
        "--options", "burn_epochs=0", "epochs=1",
    )
    log = [json.loads(l) for l in (st_dir / "log.txt").read_text().splitlines()]
    assert log and "ap50_best_ema" in log[-1]  # self-training eval ran

    # pretrain from the FULL TrainState checkpoint must also work
    st2_dir = tmp_path / "st2"
    _run(
        cfg, st2_dir,
        "--pretrain_model_path", str(burn_dir / "checkpoint"),
        "--options", "burn_epochs=0", "epochs=1",
    )
    assert (st2_dir / "log.txt").exists()

    # scripts/DINO_eval_ema.sh flow: fresh OUTPUT_DIR + --resume a
    # params-only best family + --eval --ema must evaluate the RESUMED
    # weights, not random init (ADVICE r2 high finding)
    ev_dir = tmp_path / "ev_ema"
    _run(
        cfg, ev_dir, "--eval", "--ema",
        "--resume", str(burn_dir / "best_ema_teacher"),
    )

    # precedence: an explicit --resume must win over output_dir's own
    # auto-resume checkpoint (reference fills args.resume from
    # output_dir/checkpoint.pth only when --resume is absent,
    # main.py:226-245)
    import shutil

    prec_dir = tmp_path / "prec"
    prec_dir.mkdir()
    shutil.copytree(burn_dir / "checkpoint", prec_dir / "checkpoint")
    shutil.copy(burn_dir / "checkpoint.meta.json",
                prec_dir / "checkpoint.meta.json")
    _run(
        cfg, prec_dir, "--eval",
        "--resume", str(burn_dir / "best_ema_teacher"),
    )
    # the logger's file handler was bound to the first output_dir in this
    # process; the explicit-resume line must have been logged
    log_text = (burn_dir / "log.txt").read_text()
    assert "resumed from" in log_text and "best_ema_teacher" in log_text


@pytest.mark.slow
def test_eval_flag(tmp_path):
    cfg = _write_cfg(tmp_path)
    out = tmp_path / "ev"
    _run(cfg, out, "--eval")


def test_reference_cli_flags_parse():
    """Reference main.py:38-73 flag-surface parity: --dataset_file, --note,
    --num_workers, --start_epoch, --amp all parse; --amp maps to
    amp_dtype='bfloat16' (bf16 needs no GradScaler on TPU)."""
    from datr_tpu.main import get_args_parser

    args = get_args_parser().parse_args([
        "-c", "x.py", "--dataset_file", "city2foggy", "--note", "exp1",
        "--num_workers", "2", "--start_epoch", "3", "--amp",
    ])
    assert args.dataset_file == "city2foggy"
    assert args.note == "exp1"
    assert args.num_workers == 2
    assert args.start_epoch == 3
    assert args.amp is True
