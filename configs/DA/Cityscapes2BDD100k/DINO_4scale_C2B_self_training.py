# Cityscapes -> BDD100K-daytime self-training stage (reference:
# config/DA/Cityscapes2BDD100k/DINO_4scale_city2BDD100k_self_training.py).
_base_ = ["DINO_4scale_C2B.py"]

epochs = 46
burn_epochs = 36
