# Cityscapes -> Foggy self-training stage (reference:
# config/DA/Cityscapes2FoggyCityscapes/DINO_4scale_C2F_self_training.py —
# identical to burn-in except epochs=46, burn_epochs=36).
_base_ = ["DINO_4scale_C2F.py"]

epochs = 46
burn_epochs = 36
