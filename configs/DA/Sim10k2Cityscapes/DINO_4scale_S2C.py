# Sim10k -> Cityscapes burn-in config
# (reference: config/DA/Sim10k2Cityscapes/DINO_4scale_sim2city.py)
_base_ = ["../../DINO/DINO_4scale.py"]

num_classes = 2  # car (category id 1) + implicit background slot 0;
# the reference keeps raw 1-based COCO category ids as class indices
# (config/DA/Sim10k2Cityscapes/DINO_4scale_sim2cityscapes.py:3)
dn_labelbook_size = 2
epochs = 36
lr_drop = 30
dataset_file = "sim2city"

da_backbone_loss_coef = 0.1
da_proto_loss_coef = 0.1
da_global_proto_coef = 0.1

burn_epochs = 40
strong_aug = True
pseudo_label_threshold = 0.3
ema_decay_teacher = 0.9997
ema_decay_best_model = 0.9
self_training_loss_coef = 1.0
