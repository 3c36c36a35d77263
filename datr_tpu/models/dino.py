"""DINO detection transformer with domain adaptation — flax, batch-first,
fully static shapes.

Capability match for the reference's models/dino/dino.py (DINO :43-483,
build_dino :999-1143) and deformable_transformer.py (two-stage wiring
:318-360, decoder :579-763), redesigned functionally:

- one linen module owns backbone, projections, encoder/decoder stacks and all
  heads, so decoder-internal box refinement shares parameters with the output
  heads (reference shares module objects, dino.py:163-166);
- CDN uses the static layout of datr_tpu/models/cdn.py;
- the DA state (global prototypes + counts) is threaded explicitly through
  __call__ instead of being mutated on the module (reference: dino.py:106-107,
  373-374);
- training forward processes a paired batch: first half source domain, second
  half target domain (reference: DA_utils.py:5-31 decompose_features).

Output layers are stacked along a leading axis ([n_dec, B, N, ...]) rather
than python lists of dicts so the criterion can vmap over decoder layers.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..utils.misc import inverse_sigmoid, sine_embed_for_position
from .cdn import build_cdn_queries, cdn_layout, cdn_self_attn_mask
from .da import ImageDiscriminator, class_prototypes, grad_reverse
from .layers import MLP
from .position_encoding import position_embedding_sine_hw
from .resnet import ResNet
from .transformer import (
    DeformableDecoderLayer,
    DeformableEncoderLayer,
    encoder_reference_points,
    valid_ratios_from_mask,
)

RESNET_STAGES = {"resnet50": (3, 4, 6, 3), "resnet101": (3, 4, 23, 3)}


def make_backbone(name: str, dtype, return_stages=(1, 2, 3)) -> nn.Module:
    """Backbone factory (reference: build_backbone, backbone.py:147-219 —
    resnet50/101, swin_*, convnext_*). return_stages follows the
    reference's return_interm_indices: 0 = stride-4 stage ... 3 = stride-32;
    [0,1,2,3] is the 5-scale configuration (config/DINO/DINO_5scale.py)."""
    return_stages = tuple(return_stages)
    if name in RESNET_STAGES:
        return ResNet(stage_sizes=RESNET_STAGES[name],
                      return_stages=return_stages, dtype=dtype,
                      name="backbone")
    if name.startswith("swin"):
        from .swin import SWIN_CONFIGS, SwinTransformer

        return SwinTransformer(**SWIN_CONFIGS[name],
                               return_stages=return_stages, dtype=dtype,
                               name="backbone")
    if name.startswith("convnext"):
        from .convnext import CONVNEXT_CONFIGS, ConvNeXt

        return ConvNeXt(**CONVNEXT_CONFIGS[name],
                        return_stages=return_stages, dtype=dtype,
                        name="backbone")
    raise ValueError(f"unknown backbone {name!r}")


class DINO(nn.Module):
    num_classes: int = 9
    num_queries: int = 900
    hidden_dim: int = 256
    nheads: int = 8
    enc_layers: int = 6
    dec_layers: int = 6
    dim_feedforward: int = 2048
    num_feature_levels: int = 4
    enc_n_points: int = 4
    dec_n_points: int = 4
    dropout: float = 0.0
    backbone_name: str = "resnet50"
    pe_temperature_h: float = 20.0
    pe_temperature_w: float = 20.0
    # CDN
    dn_number: int = 100
    dn_single_pad: int = 20
    dn_label_noise_ratio: float = 0.5
    dn_box_noise_scale: float = 1.0
    dn_labelbook_size: int = 9
    # head sharing (DINO_4scale_C2F.py:66-67,100-101)
    two_stage_share_heads: bool = False
    return_interm_indices: Tuple[int, ...] = (1, 2, 3)
    msda_impl: str = "xla"
    msda_bh_mode: str = "auto"  # 'flat' under tensor parallelism (mesh.py)
    msda_table_mode: str = "slice"  # quad-table build: 'slice' | 'conv'
    fast_norm: bool = False  # bf16 LN/GN with f32-accumulated stats
    sp_axis: str = ""  # mesh axis for encoder sequence parallelism ('seq')
    use_remat: bool = True
    # segmentation head (reference args.masks -> DETRsegm, dino.py:1067-1068;
    # dead in every shipped DATR config but part of the surface)
    with_masks: bool = False
    mask_query_chunk: int = 0  # bound mask-head peak memory (0 = one pass)
    dtype: Any = jnp.float32

    def setup(self):
        C = self.hidden_dim
        # the mask FPN needs raw backbone stages 0..2 (C2/C3/C4) as laterals
        # (segmentation.py:47,70); request the union with the detection stages
        backbone_stages = self.return_interm_indices
        if self.with_masks:
            backbone_stages = tuple(
                sorted(set(backbone_stages) | {0, 1, 2})
            )
        self.backbone_stages = backbone_stages
        self.backbone = make_backbone(self.backbone_name, self.dtype,
                                      backbone_stages)
        n_backbone = len(self.return_interm_indices)
        if self.with_masks:
            from .segmentation import MaskHeadSmallConv, MHAttentionMap

            self.bbox_attention = MHAttentionMap(
                C, self.nheads, dtype=self.dtype, name="bbox_attention"
            )
            self.mask_head = MaskHeadSmallConv(
                C + self.nheads, C, dtype=self.dtype, name="mask_head"
            )

        projs = []
        for i in range(self.num_feature_levels):
            if i < n_backbone:
                conv = nn.Conv(C, (1, 1), use_bias=True, dtype=self.dtype,
                               name=f"input_proj{i}_conv")
            else:
                conv = nn.Conv(C, (3, 3), strides=(2, 2), padding=1,
                               dtype=self.dtype, name=f"input_proj{i}_conv")
            from .norms import group_norm

            projs.append(
                (conv, group_norm(self.dtype, self.fast_norm,
                                  f"input_proj{i}_norm"))
            )
        self.input_projs = projs

        self.level_embed = self.param(
            "level_embed", nn.initializers.normal(1.0),
            (self.num_feature_levels, C),
        )

        enc_layer = DeformableEncoderLayer
        dec_layer = DeformableDecoderLayer
        if self.use_remat:
            enc_layer = nn.remat(enc_layer, static_argnums=(4, 6))
            dec_layer = nn.remat(dec_layer, static_argnums=(5, 8))
        self.encoder = [
            enc_layer(
                C, self.dim_feedforward, self.num_feature_levels, self.nheads,
                self.enc_n_points, self.dropout, self.msda_impl,
                self.msda_bh_mode, self.msda_table_mode, self.dtype,
                self.fast_norm,
                name=f"enc_layer{i}",
            )
            for i in range(self.enc_layers)
        ]
        self.decoder = [
            dec_layer(
                C, self.dim_feedforward, self.num_feature_levels, self.nheads,
                self.dec_n_points, self.dropout, self.msda_impl,
                self.msda_bh_mode, self.msda_table_mode, self.dtype,
                self.fast_norm,
                name=f"dec_layer{i}",
            )
            for i in range(self.dec_layers)
        ]
        from .norms import layer_norm

        self.decoder_norm = layer_norm(self.dtype, self.fast_norm,
                                       "decoder_norm")
        self.ref_point_head = MLP(C, C, 2, dtype=self.dtype,
                                  name="ref_point_head")

        # Shared output heads (dec_pred_*_embed_share=True).
        prior = 0.01
        bias_init = -math.log((1 - prior) / prior)
        self.class_head = nn.Dense(
            self.num_classes,
            bias_init=nn.initializers.constant(bias_init),
            dtype=self.dtype, name="class_head",
        )
        self.bbox_head = MLP(C, 4, 3, last_zero_init=True, dtype=self.dtype,
                             name="bbox_head")
        if self.two_stage_share_heads:
            self.enc_out_class_head = self.class_head
            self.enc_out_bbox_head = self.bbox_head
        else:
            self.enc_out_class_head = nn.Dense(
                self.num_classes,
                bias_init=nn.initializers.constant(bias_init),
                dtype=self.dtype, name="enc_out_class_head",
            )
            self.enc_out_bbox_head = MLP(
                C, 4, 3, last_zero_init=True, dtype=self.dtype,
                name="enc_out_bbox_head",
            )
        self.enc_output = nn.Dense(C, dtype=self.dtype, name="enc_output")
        self.enc_output_norm = layer_norm(self.dtype, self.fast_norm,
                                          "enc_output_norm")

        self.tgt_embed = self.param(
            "tgt_embed", nn.initializers.normal(1.0), (self.num_queries, C)
        )
        self.label_enc = self.param(
            "label_enc", nn.initializers.normal(1.0),
            (self.dn_labelbook_size + 1, C),
        )

        # DA heads (reference creates them only in training, dino.py:102-108;
        # we always create them — unused params cost nothing under jit).
        self.d_img = ImageDiscriminator(dtype=self.dtype, name="d_img")
        self.proto_d = MLP(C, 1, 3, dtype=self.dtype, name="proto_d")

    # ------------------------------------------------------------------
    # feature extraction
    # ------------------------------------------------------------------
    def _extract_features(self, images, pad_mask):
        """images [B,H,W,3], pad_mask [B,H,W] True=pad ->
        (srcs: list [B,h,w,C], masks: list [B,h,w], pos: list [B,h,w,C],
        stage_feats: dict stage -> raw backbone feature)."""
        feats_all = self.backbone(images)
        stage_feats = dict(zip(self.backbone_stages, feats_all))
        feats = [stage_feats[s] for s in self.return_interm_indices]
        srcs, masks, poss = [], [], []
        x_extra = feats[-1]
        for lvl in range(self.num_feature_levels):
            if lvl < len(feats):
                x = feats[lvl]
            elif lvl == len(feats):
                x = x_extra  # project raw last backbone feature (dino.py:266)
            else:
                x = srcs[-1]
            conv, norm = self.input_projs[lvl]
            s = norm(conv(x))
            h, w = s.shape[1], s.shape[2]
            m = jax.image.resize(
                pad_mask.astype(jnp.float32), (pad_mask.shape[0], h, w),
                method="nearest",
            ).astype(bool)
            p = position_embedding_sine_hw(
                m, self.hidden_dim // 2, self.pe_temperature_h,
                self.pe_temperature_w,
            ).astype(self.dtype)
            srcs.append(s)
            masks.append(m)
            poss.append(p)
        return srcs, masks, poss, stage_feats

    @staticmethod
    def _flatten_levels(srcs, masks, poss, level_embed):
        B = srcs[0].shape[0]
        spatial_shapes = tuple((s.shape[1], s.shape[2]) for s in srcs)
        src_flat = jnp.concatenate(
            [s.reshape(B, -1, s.shape[-1]) for s in srcs], axis=1
        )
        mask_flat = jnp.concatenate([m.reshape(B, -1) for m in masks], axis=1)
        pos_flat = jnp.concatenate(
            [
                p.reshape(B, -1, p.shape[-1]) + level_embed[i][None, None]
                for i, p in enumerate(poss)
            ],
            axis=1,
        )
        return src_flat, mask_flat, pos_flat, spatial_shapes

    # ------------------------------------------------------------------
    # two-stage proposal generation (reference: utils.py:15-60 +
    # deformable_transformer.py:318-360)
    # ------------------------------------------------------------------
    def _two_stage_select(self, memory, mask_flat, spatial_shapes):
        B, S, C = memory.shape
        proposals = []
        offset = 0
        for lvl, (h, w) in enumerate(spatial_shapes):
            m = mask_flat[:, offset : offset + h * w].reshape(B, h, w)
            offset += h * w
            valid_h = jnp.sum(~m[:, :, 0], axis=1).astype(jnp.float32)
            valid_w = jnp.sum(~m[:, 0, :], axis=1).astype(jnp.float32)
            gy, gx = jnp.meshgrid(
                jnp.arange(h, dtype=jnp.float32),
                jnp.arange(w, dtype=jnp.float32),
                indexing="ij",
            )
            grid = jnp.stack([gx, gy], axis=-1).reshape(1, h * w, 2)
            scale = jnp.stack([valid_w, valid_h], axis=-1).reshape(B, 1, 2)
            centers = (grid + 0.5) / scale
            wh = jnp.full_like(centers, 0.05 * (2.0 ** lvl))
            proposals.append(jnp.concatenate([centers, wh], axis=-1))
        proposals = jnp.concatenate(proposals, axis=1)  # [B, S, 4]

        # Reference-exact semantics (deformable_transformer.py
        # gen_encoder_output_proposals + :318-360): invalid/padded positions
        # get zeroed memory and +inf proposal logits but are NOT excluded
        # from the top-k — the trained class head scores them low. We use
        # 1e6 instead of inf (sigmoid saturates identically in f32, no
        # inf/nan propagation hazard).
        prop_valid = jnp.all(
            (proposals > 0.01) & (proposals < 0.99), axis=-1
        ) & (~mask_flat)
        out_memory = jnp.where(prop_valid[..., None], memory, 0.0)
        out_memory = self.enc_output_norm(self.enc_output(out_memory))
        prop_unsig = jnp.where(
            prop_valid[..., None], inverse_sigmoid(proposals), 1e6
        )

        enc_class = self.enc_out_class_head(out_memory)  # [B, S, K]
        enc_coord_unsig = self.enc_out_bbox_head(out_memory) + prop_unsig

        scores = jnp.max(enc_class, axis=-1)
        _, topk_idx = jax.lax.top_k(scores, self.num_queries)  # [B, nq]

        def gather(x):
            return jnp.take_along_axis(
                x, topk_idx[..., None].astype(jnp.int32), axis=1
            )

        ref_unsig_undetach = gather(enc_coord_unsig)  # [B, nq, 4]
        tgt_undetach = gather(out_memory)  # [B, nq, C]
        init_box_proposal = jax.nn.sigmoid(gather(prop_unsig))
        return ref_unsig_undetach, tgt_undetach, init_box_proposal

    # ------------------------------------------------------------------
    # encoder + two-stage + decoder over one (sub-)batch
    # ------------------------------------------------------------------
    def _transformer_pass(
        self,
        src_flat,
        mask_flat,
        pos_flat,
        valid_ratios,
        spatial_shapes,
        dn_embed: Optional[jnp.ndarray],  # [B, pad, C]
        dn_bbox_unsig: Optional[jnp.ndarray],  # [B, pad, 4]
        self_attn_mask: Optional[jnp.ndarray],  # [N, N] True=attend
        deterministic: bool,
        encoder_fn=None,
    ):
        B = src_flat.shape[0]
        # --- encoder ---
        enc_ref = encoder_reference_points(spatial_shapes, valid_ratios)
        if encoder_fn is not None:
            # externally orchestrated encoder stack (pipeline parallelism:
            # parallel/pipeline.py make_pp_encoder_fn) — layer params are
            # consumed via the stacked copies the closure holds, so the
            # in-scope enc_layer{i} submodules are intentionally unused
            memory = encoder_fn(src_flat, pos_flat, enc_ref, mask_flat,
                                spatial_shapes, deterministic)
        else:
            memory = self._sp_constraint(src_flat)
            for layer in self.encoder:
                memory = self._sp_constraint(
                    layer(memory, pos_flat, enc_ref, spatial_shapes,
                          mask_flat, deterministic)
                )
        # two-stage top-k and the decoder's MSDA tables need the full
        # sequence: replicate once here (a single all-gather over 'seq')
        memory = self._sp_constraint(memory, replicate=True)

        # --- two-stage selection ---
        ref_unsig_undetach, tgt_undetach, init_box_proposal = (
            self._two_stage_select(memory, mask_flat, spatial_shapes)
        )
        ref_unsig = jax.lax.stop_gradient(ref_unsig_undetach)
        # embed_init_tgt=True: learned content queries (DINO_4scale_C2F.py:108)
        tgt = jnp.tile(self.tgt_embed[None], (B, 1, 1)).astype(self.dtype)

        if dn_embed is not None:
            tgt = jnp.concatenate([dn_embed, tgt], axis=1)
            refpoints_unsig = jnp.concatenate([dn_bbox_unsig, ref_unsig], axis=1)
        else:
            refpoints_unsig = ref_unsig

        # --- decoder with iterative box refinement ---
        ref = jax.nn.sigmoid(refpoints_unsig)
        hs_list, refs_list = [], [ref]
        x = tgt
        vr4 = jnp.concatenate([valid_ratios, valid_ratios], axis=-1)
        for layer in self.decoder:
            ref_input = ref[:, :, None, :] * vr4[:, None, :, :]  # [B,N,L,4]
            sine = sine_embed_for_position(
                ref_input[:, :, 0, :], self.hidden_dim // 2
            ).astype(self.dtype)
            query_pos = self.ref_point_head(sine)
            x = layer(x, query_pos, memory, ref_input, spatial_shapes,
                      mask_flat, self_attn_mask, deterministic)
            # refinement uses the un-normed output (deformable_transformer.py
            # :731-753); outputs_coord outside uses the normed one.
            delta = self.bbox_head(x)
            new_ref = jax.nn.sigmoid(delta + inverse_sigmoid(ref))
            refs_list.append(new_ref)  # undetached (use_detached_boxes=False)
            ref = jax.lax.stop_gradient(new_ref)
            hs_list.append(self.decoder_norm(x))

        hs = jnp.stack(hs_list)  # [n_dec, B, N, C]
        refs = jnp.stack(refs_list)  # [n_dec+1, B, N, 4]
        return (hs, refs, tgt_undetach, ref_unsig_undetach,
                init_box_proposal, memory)

    def _sp_constraint(self, x, replicate: bool = False):
        """Sequence-parallel sharding constraint on [B, S, C] activations.

        With sp_axis set (mesh.py Mesh('data','seq','model')), the encoder's
        flattened token axis is sharded over 'seq': each chip gathers MSDA
        samples only for its query shard (value tables replicated — the
        gather is issue-bound per ROW, so rows/chip, the measured wall,
        drops by the sp factor; see ROADMAP.md ceiling analysis). XLA
        propagates the spec through LN/FFN (elementwise over tokens) and
        inserts one all-gather where the full sequence is required
        (replicate=True before two-stage select + decoder)."""
        if not self.sp_axis:
            return x
        from jax.sharding import PartitionSpec as P, get_abstract_mesh

        if get_abstract_mesh().empty:
            return x  # no mesh in context (e.g. init outside `with mesh:`)
        U = P.UNCONSTRAINED
        spec = [U] * x.ndim
        spec[1] = None if replicate else self.sp_axis
        return jax.lax.with_sharding_constraint(x, P(*spec))

    def _compute_masks(self, hs_last, srcs, masks, memory, spatial_shapes,
                       stage_feats):
        """Segmentation tail (reference DETRsegm.forward, segmentation.py:
        66-74): per-query attention maps against the stride-32 encoder
        memory, FPN mask head over raw backbone laterals C4/C3/C2."""
        from .segmentation import mask_head_forward

        lvl32 = len(self.return_interm_indices) - 1  # stride-32 level
        h32, w32 = spatial_shapes[lvl32]
        off = sum(h * w for h, w in spatial_shapes[:lvl32])
        B = hs_last.shape[0]
        memory_32 = memory[:, off : off + h32 * w32].reshape(
            B, h32, w32, -1
        )
        fpns = [stage_feats[2][:B], stage_feats[1][:B], stage_feats[0][:B]]
        return mask_head_forward(
            self.bbox_attention, self.mask_head, hs_last,
            srcs[lvl32][:B], memory_32, masks[lvl32][:B], fpns,
            query_chunk=self.mask_query_chunk,
        ).astype(jnp.float32)

    def _head_outputs(self, hs, refs):
        """Per-layer class/box outputs. hs [n_dec,B,N,C], refs [n_dec+1,...].
        Layer l pairs hs[l] (normed) with refs[l] (pre-update reference,
        undetached for l>0) — reference: dino.py:296-307."""
        logits = self.class_head(hs)
        coords = jax.nn.sigmoid(self.bbox_head(hs) + inverse_sigmoid(refs[:-1]))
        return logits, coords

    # ------------------------------------------------------------------
    def __call__(  # noqa: C901
        self,
        images: jnp.ndarray,  # [B, H, W, 3]
        pad_mask: jnp.ndarray,  # [B, H, W] True = padded pixel
        targets: Optional[Dict[str, jnp.ndarray]] = None,  # source-half GT
        dn_rng: Optional[jax.Array] = None,
        train: bool = False,
        self_training: bool = False,
        global_proto: Optional[jnp.ndarray] = None,  # [K, C]
        amount: Optional[jnp.ndarray] = None,  # [K]
        deterministic: bool = True,
        domain_adapt: bool = True,  # False: single-domain supervised
        # training over the FULL batch, no DA branch (plain-DINO
        # pretraining; reference datasets/coco.py:611-640 path)
        encoder_fn=None,  # pipeline-parallel encoder override
        # (parallel/pipeline.py:make_pp_encoder_fn); None = in-module stack
    ):
        srcs, masks, poss, stage_feats = self._extract_features(
            images, pad_mask
        )
        src_flat, mask_flat, pos_flat, spatial_shapes = self._flatten_levels(
            srcs, masks, poss, self.level_embed
        )
        valid_ratios = valid_ratios_from_mask(masks)

        out: Dict[str, Any] = {}

        if not train:
            (hs, refs, tgt_undetach, ref_unsig_undetach, init_box_proposal,
             memory) = (
                self._transformer_pass(
                    src_flat, mask_flat, pos_flat, valid_ratios,
                    spatial_shapes, None, None, None, True,
                    encoder_fn=encoder_fn,
                )
            )
            logits, coords = self._head_outputs(hs, refs)
            out["pred_logits"] = logits[-1]
            out["pred_boxes"] = coords[-1]
            out["aux_logits"] = logits[:-1]
            out["aux_boxes"] = coords[:-1]
            out["interm_logits"] = self.enc_out_class_head(tgt_undetach)
            out["interm_boxes"] = jax.nn.sigmoid(ref_unsig_undetach)
            out["init_box_proposal"] = init_box_proposal
            if self.with_masks:
                out["pred_masks"] = self._compute_masks(
                    hs[-1], srcs, masks, memory, spatial_shapes, stage_feats,
                )
            return out

        # ---------------- training: paired source/target batch -------------
        # (domain_adapt=False: the whole batch is supervised, halves unused)
        B = images.shape[0]
        if domain_adapt:
            assert B % 2 == 0, "paired DA batches must have even batch size"
            half = B // 2
        else:
            half = B

        def first_half(t):
            return t[:half]

        def second_half(t):
            return t[half:]

        if self.dn_number > 0:
            groups, pad_size = cdn_layout(self.dn_number, self.dn_single_pad)
            cdn = build_cdn_queries(
                dn_rng, targets["boxes"], targets["labels"],
                targets["valid"], self.label_enc, self.num_classes,
                self.dn_number, self.dn_single_pad,
                self.dn_label_noise_ratio, self.dn_box_noise_scale,
            )
            attn_mask = jnp.asarray(
                cdn_self_attn_mask(self.num_queries, self.dn_single_pad,
                                   groups)
            )
            dn_embed = cdn.query_label_embed.astype(self.dtype)
            dn_bbox = cdn.query_bbox_unsig
        else:  # use_dn=False (build_dino: dn_number=0, dino.py:1062)
            pad_size = 0
            cdn = None
            attn_mask = dn_embed = dn_bbox = None

        (hs, refs, tgt_undetach, ref_unsig_undetach, init_box_proposal,
         memory) = (
            self._transformer_pass(
                first_half(src_flat), first_half(mask_flat),
                first_half(pos_flat), first_half(valid_ratios),
                spatial_shapes, dn_embed, dn_bbox, attn_mask, deterministic,
                encoder_fn=encoder_fn,
            )
        )
        logits_all, coords_all = self._head_outputs(hs, refs)
        if cdn is not None:
            # split DN part from matching part (dn_components.py:140-154)
            out["dn_logits"] = logits_all[:, :, :pad_size]
            out["dn_boxes"] = coords_all[:, :, :pad_size]
            out["dn_valid"] = cdn.dn_valid
        logits = logits_all[:, :, pad_size:]
        coords = coords_all[:, :, pad_size:]
        out["pred_logits"] = logits[-1]
        out["pred_boxes"] = coords[-1]
        out["aux_logits"] = logits[:-1]
        out["aux_boxes"] = coords[:-1]
        out["interm_logits"] = self.enc_out_class_head(tgt_undetach)
        out["interm_boxes"] = jax.nn.sigmoid(ref_unsig_undetach)
        out["init_box_proposal"] = init_box_proposal
        if self.with_masks:
            # matching queries only (DN part excluded), supervised half
            out["pred_masks"] = self._compute_masks(
                hs[-1][:, pad_size:], srcs, masks, memory, spatial_shapes,
                stage_feats,
            )

        if not domain_adapt:
            return out

        # ---------------- DA branch ---------------------------------------
        # 1. image-level discriminator over all domains (dino.py:350-359)
        d_logits = []
        for s in srcs:
            d = self.d_img(grad_reverse(s))  # [B, h, w, 1]
            d_logits.append(d.reshape(B, -1, 1))
        out["da_backbone"] = jnp.concatenate(d_logits, axis=1)  # [B, S, 1]

        # 2. source prototypes from matching queries (dino.py:362-374)
        proto_src = class_prototypes(
            hs[-1][:, pad_size:], out["pred_logits"], global_proto, amount
        )

        # 3. target-domain pass (no DN), prototypes (dino.py:378-393)
        (hs_t, refs_t, tgt_undetach_t, ref_unsig_undetach_t, init_prop_t,
         _memory_t) = (
            self._transformer_pass(
                second_half(src_flat), second_half(mask_flat),
                second_half(pos_flat), second_half(valid_ratios),
                spatial_shapes, None, None, None, deterministic,
                encoder_fn=encoder_fn,
            )
        )
        logits_t_last = self.class_head(hs_t[-1])
        proto_tgt = class_prototypes(
            hs_t[-1], logits_t_last, proto_src.new_global_proto,
            proto_src.new_amount,
        )

        protos = jnp.concatenate(
            [proto_src.prototypes, proto_tgt.prototypes], axis=0
        )  # [2K, C]
        out["da_protos"] = self.proto_d(grad_reverse(protos))  # [2K, 1]
        out["da_class_map_source"] = proto_src.valid_class_map
        out["da_class_map_target"] = proto_tgt.valid_class_map
        out["da_query_source"] = proto_src.prototypes
        out["da_query_target"] = proto_tgt.prototypes
        out["new_global_proto"] = proto_tgt.new_global_proto
        out["new_amount"] = proto_tgt.new_amount

        if self_training:
            logits_t, coords_t = self._head_outputs(hs_t, refs_t)
            out["pred_logits_target"] = logits_t[-1]
            out["pred_boxes_target"] = coords_t[-1]
            out["aux_logits_target"] = logits_t[:-1]
            out["aux_boxes_target"] = coords_t[:-1]
            out["interm_logits_target"] = self.enc_out_class_head(
                tgt_undetach_t
            )
            out["interm_boxes_target"] = jax.nn.sigmoid(ref_unsig_undetach_t)
        return out


def build_dino_from_config(cfg) -> DINO:
    """Config -> model (reference: build_dino, dino.py:999-1143)."""
    get = cfg.get if hasattr(cfg, "get") else lambda k, d=None: getattr(
        cfg, k, d
    )
    # float64 (with jax_enable_x64) is for numerical-parity debugging: it
    # drops cross-framework activation noise below top-k score gaps so
    # selection orders match exactly (tests/test_torch_parity_train.py).
    dtype = {"bfloat16": jnp.bfloat16, "float64": jnp.float64}.get(
        get("amp_dtype", "float32"), jnp.float32
    )
    return DINO(
        num_classes=get("num_classes", 91),
        num_queries=get("num_queries", 900),
        hidden_dim=get("hidden_dim", 256),
        nheads=get("nheads", 8),
        enc_layers=get("enc_layers", 6),
        dec_layers=get("dec_layers", 6),
        dim_feedforward=get("dim_feedforward", 2048),
        num_feature_levels=get("num_feature_levels", 4),
        enc_n_points=get("enc_n_points", 4),
        dec_n_points=get("dec_n_points", 4),
        dropout=get("dropout", 0.0),
        backbone_name=get("backbone", "resnet50"),
        pe_temperature_h=get("pe_temperatureH", 20),
        pe_temperature_w=get("pe_temperatureW", 20),
        dn_number=get("dn_number", 100) if get("use_dn", True) else 0,
        dn_single_pad=get("dn_single_pad", 20),
        dn_label_noise_ratio=get("dn_label_noise_ratio", 0.5),
        dn_box_noise_scale=get("dn_box_noise_scale", 1.0),
        dn_labelbook_size=get("dn_labelbook_size", get("num_classes", 91)),
        two_stage_share_heads=get("two_stage_bbox_embed_share", False),
        return_interm_indices=tuple(get("return_interm_indices", [1, 2, 3])),
        msda_impl=get("msda_impl", "xla"),
        msda_bh_mode=get("msda_bh_mode", "auto"),
        msda_table_mode=get("msda_table_mode", "slice"),
        fast_norm=get("fast_norm", False),
        sp_axis=get("sp_axis", ""),
        use_remat=get("use_remat", True),
        with_masks=get("masks", False),
        mask_query_chunk=get("mask_query_chunk", 0),
        dtype=dtype,
    )


from .registry import register_model  # noqa: E402


@register_model("dino")
def _build_dino_entry(cfg):
    from ..train.criterion import CriterionCfg, build_weight_dict
    from .cdn import cdn_layout

    get = cfg.get if hasattr(cfg, "get") else lambda k, d=None: getattr(
        cfg, k, d
    )
    model = build_dino_from_config(cfg)
    groups, _ = cdn_layout(model.dn_number, model.dn_single_pad)
    ccfg = CriterionCfg(
        num_classes=model.num_classes,
        focal_alpha=get("focal_alpha", 0.25),
        cost_class=get("set_cost_class", 2.0),
        cost_bbox=get("set_cost_bbox", 5.0),
        cost_giou=get("set_cost_giou", 2.0),
        dn_single_pad=model.dn_single_pad,
        dn_groups=groups,
        matcher_type=get("matcher_type", "HungarianMatcher"),
    )
    weight_dict = build_weight_dict(
        dec_layers=model.dec_layers,
        cls_loss_coef=get("cls_loss_coef", 1.0),
        bbox_loss_coef=get("bbox_loss_coef", 5.0),
        giou_loss_coef=get("giou_loss_coef", 2.0),
        da_backbone_loss_coef=get("da_backbone_loss_coef", 0.1),
        da_proto_loss_coef=get("da_proto_loss_coef", 0.1),
        da_global_proto_coef=get("da_global_proto_coef", 0.1),
        interm_loss_coef=get("interm_loss_coef", 1.0),
        no_interm_box_loss=get("no_interm_box_loss", False),
        use_dn=get("use_dn", True),
        # masks=True must reach the weight dict too, else loss_mask/loss_dice
        # are dropped by the weighted total and the mask head silently gets
        # zero gradient (reference wires coefs at dino.py:1099-1101)
        masks=get("masks", False),
        mask_loss_coef=get("mask_loss_coef", 1.0),
        dice_loss_coef=get("dice_loss_coef", 1.0),
    )
    weight_dict["loss_self_training"] = get("self_training_loss_coef", 1.0)
    return model, ccfg, weight_dict
