# DINO-R50 5-scale (reference: config/DINO/DINO_5scale.py — the only key
# changes vs 4-scale are return_interm_indices=[0,1,2,3], num_feature_levels=5
# and batch_size=1).
_base_ = ["DINO_4scale.py"]

batch_size = 1
return_interm_indices = [0, 1, 2, 3]
num_feature_levels = 5
