"""Helpers to import the REFERENCE torch SAM-2 modules (read-only, CPU) for
golden-parity tests. hydra/iopath are stubbed; nothing from the reference is
copied — its modules are executed as the golden oracle."""
import sys
import types

REF = "/root/reference/VideoGLaMM"


def _stub(name, **attrs):
    if name in sys.modules:
        return sys.modules[name]
    m = types.ModuleType(name)
    # a registered module with __spec__=None breaks importlib.util.find_spec
    # for every LATER importer (transformers' dependency probe raises
    # "torchvision.__spec__ is None") — give stubs a real spec
    import importlib.machinery
    m.__spec__ = importlib.machinery.ModuleSpec(name, None)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


def load_reference_sam2():
    """Returns the reference `model.segment_anything_2.sam2.modeling` package
    (imports lazily, stubbing hydra)."""
    if REF not in sys.path:
        sys.path.insert(0, REF)
    _stub("hydra", initialize_config_module=lambda *a, **k: None,
          compose=lambda *a, **k: None)
    _stub("hydra.utils", instantiate=lambda *a, **k: None)
    core = _stub("hydra.core")
    gh = _stub("hydra.core.global_hydra")

    class _GH:
        @staticmethod
        def instance():
            class I:
                def is_initialized(self):
                    return True
            return I()

    gh.GlobalHydra = _GH
    core.global_hydra = gh
    _stub("iopath")
    _stub("iopath.common")
    _stub("iopath.common.file_io", g_pathmgr=None)

    import importlib
    import torch
    # the reference memory path hardcodes .cuda() on memory tensors
    # (sam2_base.py:573-578); run it on CPU for the oracle
    torch.Tensor.cuda = lambda self, *a, **k: self
    return importlib.import_module("model.segment_anything_2.sam2.modeling")


def build_reference_sam2(cfg, seed: int = 0):
    """Construct the reference torch SAM2Base matching a videoglamm_tpu
    SAM2Config (tiny or flagship), with randomized weights."""
    load_reference_sam2()
    import torch
    from model.segment_anything_2.sam2.modeling.sam2_base import SAM2Base
    from model.segment_anything_2.sam2.modeling.backbones.hieradet import \
        Hiera
    from model.segment_anything_2.sam2.modeling.backbones.image_encoder \
        import ImageEncoder, FpnNeck
    from model.segment_anything_2.sam2.modeling.position_encoding import \
        PositionEmbeddingSine
    from model.segment_anything_2.sam2.modeling.memory_attention import \
        MemoryAttention, MemoryAttentionLayer
    from model.segment_anything_2.sam2.modeling.memory_encoder import \
        MemoryEncoder, MaskDownSampler, Fuser, CXBlock
    from model.segment_anything_2.sam2.modeling.sam.transformer import \
        RoPEAttention

    torch.manual_seed(seed)
    h = cfg.hiera
    d_model = cfg.d_model
    trunk = Hiera(embed_dim=h.embed_dim, num_heads=h.num_heads,
                  stages=h.stages, global_att_blocks=h.global_att_blocks,
                  window_spec=h.window_spec,
                  window_pos_embed_bkg_spatial_size=
                  h.window_pos_embed_bkg_spatial_size)
    with torch.no_grad():
        trunk.pos_embed.normal_(std=0.5)
        trunk.pos_embed_window.normal_(std=0.5)
    neck = FpnNeck(
        position_encoding=PositionEmbeddingSine(
            num_pos_feats=d_model, normalize=True, scale=None,
            temperature=10000),
        d_model=d_model,
        backbone_channel_list=list(h.channel_list),
        fpn_top_down_levels=list(cfg.fpn_top_down_levels),
        fpn_interp_model=cfg.fpn_interp_model)
    image_encoder = ImageEncoder(trunk=trunk, neck=neck,
                                 scalp=cfg.backbone_scalp)

    grid = cfg.memory_rope_feat_sizes
    layer = MemoryAttentionLayer(
        activation="relu",
        dim_feedforward=cfg.memory_attention_dim_feedforward,
        dropout=0.1, pos_enc_at_attn=False, d_model=d_model,
        pos_enc_at_cross_attn_keys=True, pos_enc_at_cross_attn_queries=False,
        self_attention=RoPEAttention(
            rope_theta=cfg.memory_rope_theta, feat_sizes=list(grid),
            embedding_dim=d_model, num_heads=1, downsample_rate=1,
            dropout=0.1),
        cross_attention=RoPEAttention(
            rope_theta=cfg.memory_rope_theta, feat_sizes=list(grid),
            rope_k_repeat=True, embedding_dim=d_model, num_heads=1,
            downsample_rate=1, dropout=0.1, kv_in_dim=cfg.mem_dim))
    memory_attention = MemoryAttention(
        d_model=d_model, pos_enc_at_input=True, layer=layer,
        num_layers=cfg.memory_attention_layers)

    memory_encoder = MemoryEncoder(
        out_dim=cfg.mem_dim,
        position_encoding=PositionEmbeddingSine(
            num_pos_feats=cfg.mem_dim, normalize=True, scale=None,
            temperature=10000),
        mask_downsampler=MaskDownSampler(embed_dim=d_model, kernel_size=3,
                                         stride=2, padding=1),
        fuser=Fuser(CXBlock(dim=d_model, kernel_size=7, padding=3,
                            layer_scale_init_value=1e-6, use_dwconv=True),
                    num_layers=2),
        in_dim=d_model)

    model = SAM2Base(
        image_encoder=image_encoder, memory_attention=memory_attention,
        memory_encoder=memory_encoder, num_maskmem=cfg.num_maskmem,
        max_obj_ptrs_in_encoder=cfg.max_obj_ptrs_in_encoder,
        memory_temporal_stride_for_eval=cfg.memory_temporal_stride_for_eval,
        max_cond_frames_in_attn=cfg.max_cond_frames_in_attn,
        binarize_mask_from_pts_for_mem_enc=(
            cfg.binarize_mask_from_pts_for_mem_enc),
        image_size=cfg.image_size, backbone_stride=16,
        sigmoid_scale_for_mem_enc=cfg.sigmoid_scale_for_mem_enc,
        sigmoid_bias_for_mem_enc=cfg.sigmoid_bias_for_mem_enc,
        use_mask_input_as_output_without_sam=True,
        directly_add_no_mem_embed=cfg.directly_add_no_mem_embed,
        use_high_res_features_in_sam=cfg.use_high_res_features_in_sam,
        multimask_output_in_sam=cfg.multimask_output_in_sam,
        iou_prediction_use_sigmoid=cfg.iou_prediction_use_sigmoid,
        use_obj_ptrs_in_encoder=cfg.use_obj_ptrs_in_encoder,
        add_tpos_enc_to_obj_ptrs=cfg.add_tpos_enc_to_obj_ptrs,
        only_obj_ptrs_in_the_past_for_eval=
        cfg.only_obj_ptrs_in_the_past_for_eval,
        pred_obj_scores=cfg.pred_obj_scores,
        pred_obj_scores_mlp=cfg.pred_obj_scores_mlp,
        fixed_no_obj_ptr=cfg.fixed_no_obj_ptr,
        multimask_output_for_tracking=cfg.multimask_output_for_tracking,
        use_multimask_token_for_obj_ptr=cfg.use_multimask_token_for_obj_ptr,
        multimask_min_pt_num=cfg.multimask_min_pt_num,
        multimask_max_pt_num=cfg.multimask_max_pt_num,
        use_mlp_for_obj_ptr_proj=cfg.use_mlp_for_obj_ptr_proj,
        # the reference video-predictor build enables the eval-time dynamic
        # multimask stability reselect via hydra overrides
        # (build_sam.py:27-29); mirror the flax config so the [SEG] decode
        # path (multimask_output=False) is oracle-comparable in eval mode
        sam_mask_decoder_extra_args=dict(
            dynamic_multimask_via_stability=cfg.dynamic_multimask_via_stability,
            dynamic_multimask_stability_delta=
            cfg.dynamic_multimask_stability_delta,
            dynamic_multimask_stability_thresh=
            cfg.dynamic_multimask_stability_thresh),
        compile_image_encoder=False)
    model.eval()
    # randomize zero-initialized embeddings so parity is meaningful
    with torch.no_grad():
        for p in [model.no_mem_embed, model.no_mem_pos_enc,
                  model.maskmem_tpos_enc]:
            p.normal_(std=0.5)
    return model
