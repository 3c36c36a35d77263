# Sim10k -> Cityscapes self-training stage (reference:
# config/DA/Sim10k2Cityscapes/DINO_4scale_sim2cityscapes_self_training.py).
_base_ = ["DINO_4scale_S2C.py"]

epochs = 46
burn_epochs = 36
