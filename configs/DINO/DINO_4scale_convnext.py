# DINO ConvNeXt-XL 4-scale (reference: config/DINO/DINO_4scale_convnext.py).
_base_ = ["DINO_4scale.py"]

backbone = "convnext_xlarge_22k"
