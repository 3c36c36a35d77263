# Cityscapes -> BDD100K-daytime burn-in config
# (reference: config/DA/Cityscapes2BDD100k/DINO_4scale_city2bdd.py)
_base_ = ["../../DINO/DINO_4scale.py"]

num_classes = 9  # 8 classes, raw 1-based category ids (reference :3)
dn_labelbook_size = 9
epochs = 36
lr_drop = 30
dataset_file = "city2bdd100k"

da_backbone_loss_coef = 0.1
da_proto_loss_coef = 0.1
da_global_proto_coef = 0.1

burn_epochs = 40
strong_aug = True
pseudo_label_threshold = 0.3
ema_decay_teacher = 0.9997
ema_decay_best_model = 0.9
self_training_loss_coef = 1.0
