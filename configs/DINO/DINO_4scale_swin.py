# DINO Swin-L 4-scale (reference: config/DINO/DINO_4scale_swin.py —
# backbone='swin_L_384_22k', use_checkpoint=True; use_checkpoint maps to
# use_remat here).
_base_ = ["DINO_4scale.py"]

backbone = "swin_L_384_22k"
use_remat = True
