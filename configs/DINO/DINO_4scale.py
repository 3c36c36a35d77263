# Base DINO-R50 4-scale config (mirrors the key set of the reference's
# config/DINO/DINO_4scale.py; values cross-checked against
# config/DA/Cityscapes2FoggyCityscapes/DINO_4scale_C2F.py).

num_classes = 91

# optimization
lr = 1e-4
lr_backbone = 1e-5
batch_size = 2
weight_decay = 1e-4
epochs = 12
lr_drop = 11
save_checkpoint_interval = 1
clip_max_norm = 0.1

# model
modelname = "dino"
backbone = "resnet50"
position_embedding = "sine"
pe_temperatureH = 20
pe_temperatureW = 20
return_interm_indices = [1, 2, 3]
enc_layers = 6
dec_layers = 6
dim_feedforward = 2048
hidden_dim = 256
dropout = 0.0
nheads = 8
num_queries = 900
query_dim = 4
num_feature_levels = 4
enc_n_points = 4
dec_n_points = 4
two_stage_type = "standard"
two_stage_bbox_embed_share = False
two_stage_class_embed_share = False
num_select = 300
transformer_activation = "relu"
masks = False
aux_loss = True

# matching / loss coefficients
set_cost_class = 2.0
set_cost_bbox = 5.0
set_cost_giou = 2.0
cls_loss_coef = 1.0
bbox_loss_coef = 5.0
giou_loss_coef = 2.0
interm_loss_coef = 1.0
no_interm_box_loss = False
focal_alpha = 0.25

matcher_type = "HungarianMatcher"
nms_iou_threshold = -1
dec_pred_bbox_embed_share = True
dec_pred_class_embed_share = True

# denoising
use_dn = True
dn_number = 100
dn_single_pad = 20  # static DN layout cap (TPU redesign of max(known_num))
dn_box_noise_scale = 0.4
dn_label_noise_ratio = 0.5
embed_init_tgt = True
dn_labelbook_size = 91

# ema
use_ema = False
ema_decay = 0.9997
ema_epoch = 0

# data (static canvases; see datr_tpu/data/transforms.py)
data_aug_scales = [480, 512, 544, 576, 608, 640, 672, 704, 736, 768, 800]
data_aug_max_size = 1333
data_aug_scales2_resize = [400, 500, 600]
data_aug_scales2_crop = [384, 600]
canvas_h = 800
canvas_w = 1344

# runtime
amp_dtype = "float32"  # or "bfloat16"
msda_impl = "xla"
use_remat = True
