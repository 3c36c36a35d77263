# Cityscapes -> Foggy Cityscapes burn-in config
# (reference: config/DA/Cityscapes2FoggyCityscapes/DINO_4scale_C2F.py)
_base_ = ["../../DINO/DINO_4scale.py"]

num_classes = 9
dn_labelbook_size = 9
epochs = 36
lr_drop = 30
dataset_file = "city2foggy"

# C2F uses 1.5x scales capped at 2048 (coco_transformer_C2F.py:2-8)
data_aug_scales = [int(s * 1.5) for s in
                   [480, 512, 544, 576, 608, 640, 672, 704, 736, 768, 800]]
data_aug_max_size = 2048
data_aug_scales2_resize = [int(s * 1.5) for s in [400, 500, 600]]
data_aug_scales2_crop = [int(s * 1.5) for s in [384, 600]]
canvas_h = 1216
canvas_w = 2048

# DA coefficients (DINO_4scale_C2F.py:89-92)
da_backbone_loss_coef = 0.1
da_proto_loss_coef = 0.1
da_global_proto_coef = 0.1

# self-training (DINO_4scale_C2F.py:120-127)
burn_epochs = 40
strong_aug = True
pseudo_label_threshold = 0.3
ema_decay_teacher = 0.9997
ema_decay_best_model = 0.9
self_training_loss_coef = 1.0
