from .msda import ms_deform_attn, ms_deform_attn_xla
from .focal import sigmoid_focal_loss
