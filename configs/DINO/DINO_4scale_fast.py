# Opt-in TPU throughput variant of DINO-R50 4-scale.
#
# NOT a reference-parity model: exact MSDA on this toolchain is
# gather-issue-bound at ~1 row per (head, query, level, point) sample
# (ROADMAP.md "MSDA ceiling analysis"), so the only lever past the wall is
# fewer samples. This config halves the sampling points per level
# (enc/dec_n_points 4 -> 2), which halves the dominant gather + weighting +
# reduce slices (~73% of the inference step). Models trained with this
# config are NOT checkpoint-compatible with the reference's published
# weights — train from scratch or distill. Accuracy impact on COCO-class
# benchmarks for P=2 deformable attention is small in the literature but
# must be re-validated per dataset.
_base_ = ["DINO_4scale.py"]

enc_n_points = 2
dec_n_points = 2
