"""Typed configuration system.

One consolidated config tree replaces the reference's four heterogeneous
mechanisms (HfArgumentParser dataclass, per-script argparse, Hydra YAML for
SAM-2, env vars — see /root/reference/VideoGLaMM/... noted per class below).

All configs are frozen dataclasses so they can be closed over by jitted
functions as static values. Every architecture config has a `tiny()` preset
used by the test-suite / multi-chip dry runs, and a full-size preset matching
the reference checkpoints.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Tuple


def _replace(cfg, **kw):
    return dataclasses.replace(cfg, **kw)


# ---------------------------------------------------------------------------
# Vision: CLIP ViT (spatial / "context image" encoder)
# ---------------------------------------------------------------------------
@dataclass(frozen=True)
class CLIPVisionConfig:
    """CLIP vision tower (reference: CLIPVisionTower over HF CLIPVisionModel,
    model/videogpt_plus/model/multimodal_encoder/clip_encoder.py:7-120)."""
    image_size: int = 336
    patch_size: int = 14
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 4096
    layer_norm_eps: float = 1e-5
    # features taken from hidden_states[select_layer]; "patch" drops CLS
    select_layer: int = -2
    select_feature: str = "patch"

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid * self.grid

    @staticmethod
    def vit_l_336() -> "CLIPVisionConfig":
        return CLIPVisionConfig()

    @staticmethod
    def tiny() -> "CLIPVisionConfig":
        return CLIPVisionConfig(image_size=56, patch_size=14, hidden_size=32,
                                num_layers=2, num_heads=2, intermediate_size=64)


# ---------------------------------------------------------------------------
# Vision: InternVideo2 (temporal encoder)
# ---------------------------------------------------------------------------
@dataclass(frozen=True)
class InternVideo2Config:
    """InternVideo2-1B video tower (reference: PretrainInternVideo2,
    model/videogpt_plus/model/internvideo/internvideo2.py:388-518)."""
    image_size: int = 224
    patch_size: int = 14
    embed_dim: int = 1408
    depth: int = 40
    num_heads: int = 16
    mlp_ratio: float = 48.0 / 11.0
    num_frames: int = 4          # frames per chunk (tube)
    tubelet_size: int = 1
    qkv_bias: bool = False
    qk_normalization: bool = True
    init_values: float = 1e-5    # layer-scale init
    rms_eps: float = 1e-6
    attn_pool_num_heads: int = 16
    clip_embed_dim: int = 768    # attention-pool projector output (unused by fusion)
    # fusion consumes the final block's patch tokens (x_vis_return_idx=-1)

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @property
    def tokens_per_frame(self) -> int:
        return self.grid * self.grid

    @staticmethod
    def internvideo2_1b() -> "InternVideo2Config":
        return InternVideo2Config()

    @staticmethod
    def tiny() -> "InternVideo2Config":
        return InternVideo2Config(image_size=28, patch_size=14, embed_dim=32,
                                  depth=2, num_heads=2, mlp_ratio=2.0,
                                  attn_pool_num_heads=2, clip_embed_dim=16)


# ---------------------------------------------------------------------------
# V->L projectors
# ---------------------------------------------------------------------------
@dataclass(frozen=True)
class ProjectorConfig:
    """V->L projector (reference: build_vision_projector,
    model/videogpt_plus/model/multimodal_projector/builder.py:5-55)."""
    projector_type: str = "mlp2x_gelu"   # "linear" | "mlp2x_gelu" | "identity"
    input_dim: int = 1408
    output_dim: int = 3072


# ---------------------------------------------------------------------------
# LLM: Phi-3-mini
# ---------------------------------------------------------------------------
@dataclass(frozen=True)
class Phi3Config:
    """Phi-3-mini-4k-instruct decoder (reference wraps HF Phi3ForCausalLM,
    model/videogpt_plus/model/language_model/phi3.py:10-146)."""
    vocab_size: int = 32064
    hidden_size: int = 3072
    intermediate_size: int = 8192
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: int = 32
    head_dim: int = 96
    rope_theta: float = 10000.0
    max_position_embeddings: int = 4096
    rms_norm_eps: float = 1e-5
    tie_word_embeddings: bool = False

    @staticmethod
    def phi3_mini_4k() -> "Phi3Config":
        return Phi3Config()

    @staticmethod
    def tiny() -> "Phi3Config":
        return Phi3Config(vocab_size=512, hidden_size=64, intermediate_size=128,
                          num_layers=2, num_heads=4, num_kv_heads=4, head_dim=16,
                          max_position_embeddings=512)


# ---------------------------------------------------------------------------
# LLM: Llama-3.1 (alternate base; reference keeps it as config plumbing only)
# ---------------------------------------------------------------------------
@dataclass(frozen=True)
class LlamaConfig:
    """Llama-3.1-8B decoder (reference: language_model/llama3_1.py)."""
    vocab_size: int = 128256
    hidden_size: int = 4096
    intermediate_size: int = 14336
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: int = 8
    head_dim: int = 128
    rope_theta: float = 500000.0
    max_position_embeddings: int = 8192
    rms_norm_eps: float = 1e-5
    tie_word_embeddings: bool = False

    @staticmethod
    def llama3_1_8b() -> "LlamaConfig":
        return LlamaConfig()

    @staticmethod
    def tiny() -> "LlamaConfig":
        return LlamaConfig(vocab_size=512, hidden_size=64, intermediate_size=128,
                           num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
                           max_position_embeddings=512)


# ---------------------------------------------------------------------------
# SAM-2 pixel decoder
# ---------------------------------------------------------------------------
@dataclass(frozen=True)
class HieraConfig:
    """Hiera trunk (reference: backbones/hieradet.py:23-295;
    sam2_configs/sam2_hiera_l.yaml:8-17)."""
    embed_dim: int = 144
    num_heads: int = 2
    stages: Tuple[int, ...] = (2, 6, 36, 4)
    global_att_blocks: Tuple[int, ...] = (23, 33, 43)
    window_pos_embed_bkg_spatial_size: Tuple[int, int] = (7, 7)
    window_spec: Tuple[int, ...] = (8, 4, 16, 8)
    q_pool: int = 3
    q_stride: Tuple[int, int] = (2, 2)
    dim_mul: float = 2.0
    head_mul: float = 2.0
    mlp_ratio: float = 4.0
    patch_kernel: int = 7
    patch_stride: int = 4
    patch_padding: int = 3

    @property
    def channel_list(self) -> Tuple[int, ...]:
        # per-stage output channels, highest stage first (matches FPN input order)
        dims = [int(self.embed_dim * self.dim_mul ** i) for i in range(len(self.stages))]
        return tuple(reversed(dims))

    @staticmethod
    def hiera_l() -> "HieraConfig":
        return HieraConfig()

    @staticmethod
    def tiny() -> "HieraConfig":
        return HieraConfig(embed_dim=16, num_heads=1, stages=(1, 1, 1, 1),
                           global_att_blocks=(2,), window_spec=(4, 2, 2, 2))


@dataclass(frozen=True)
class SAM2Config:
    """SAM-2 composite (reference: modeling/sam2_base.py:22-833 +
    sam2_configs/sam2_hiera_l.yaml)."""
    hiera: HieraConfig = field(default_factory=HieraConfig.hiera_l)
    image_size: int = 1024
    d_model: int = 256                 # FPN/neck + SAM transformer width
    backbone_scalp: int = 1            # drop lowest-res backbone level
    fpn_top_down_levels: Tuple[int, ...] = (2, 3)
    fpn_interp_model: str = "nearest"
    # memory machinery
    num_maskmem: int = 7
    mem_dim: int = 64
    memory_attention_layers: int = 4
    memory_attention_dim_feedforward: int = 2048
    memory_rope_theta: float = 10000.0
    memory_rope_feat_sizes: Tuple[int, int] = (32, 32)
    max_obj_ptrs_in_encoder: int = 16
    # eval-time memory-bank temporal stride (the `r` of XMem/Cutie; reference
    # sam2_base.py:58-61,535-559) and the cap on cond frames cross-attended
    # per tracked frame (-1 = all; reference sam2_base.py:37-39 +
    # sam2_utils.py select_closest_cond_frames)
    memory_temporal_stride_for_eval: int = 1
    max_cond_frames_in_attn: int = -1
    # the video-predictor build hard-thresholds prompted-frame masks before
    # memory encoding (build_sam.py:62 ++model.binarize_mask_from_pts_for_
    # mem_enc=true; applied to every user-prompted frame via the preflight
    # consolidation's is_mask_from_pts=True, sam2_video_predictor.py:626-632)
    binarize_mask_from_pts_for_mem_enc: bool = True
    # behavior flags (mirroring sam2_hiera_l.yaml:90-117)
    sigmoid_scale_for_mem_enc: float = 20.0
    sigmoid_bias_for_mem_enc: float = -10.0
    directly_add_no_mem_embed: bool = True
    use_high_res_features_in_sam: bool = True
    multimask_output_in_sam: bool = True
    iou_prediction_use_sigmoid: bool = True
    use_obj_ptrs_in_encoder: bool = True
    add_tpos_enc_to_obj_ptrs: bool = False
    only_obj_ptrs_in_the_past_for_eval: bool = True
    pred_obj_scores: bool = True
    pred_obj_scores_mlp: bool = True
    fixed_no_obj_ptr: bool = True
    multimask_output_for_tracking: bool = True
    use_multimask_token_for_obj_ptr: bool = True
    multimask_min_pt_num: int = 0
    multimask_max_pt_num: int = 1
    use_mlp_for_obj_ptr_proj: bool = True
    dynamic_multimask_via_stability: bool = True
    dynamic_multimask_stability_delta: float = 0.05
    dynamic_multimask_stability_thresh: float = 0.98

    @property
    def backbone_stride(self) -> int:
        return 16

    @property
    def low_res_size(self) -> int:
        return self.image_size // self.backbone_stride  # 64 @ 1024

    @staticmethod
    def sam2_hiera_l() -> "SAM2Config":
        return SAM2Config()

    @staticmethod
    def tiny() -> "SAM2Config":
        return SAM2Config(hiera=HieraConfig.tiny(), image_size=128, d_model=32,
                          memory_attention_layers=1,
                          memory_attention_dim_feedforward=64,
                          mem_dim=16, memory_rope_feat_sizes=(4, 4))


# ---------------------------------------------------------------------------
# SAM-1 pixel decoder (v1 / v1_itm alternative)
# ---------------------------------------------------------------------------
@dataclass(frozen=True)
class SAM1Config:
    """SAM-1 ViT-H alternative (reference: model/segment_anything/build_sam.py:16-112)."""
    image_size: int = 1024
    encoder_embed_dim: int = 1280
    encoder_depth: int = 32
    encoder_num_heads: int = 16
    encoder_global_attn_indexes: Tuple[int, ...] = (7, 15, 23, 31)
    window_size: int = 14
    prompt_embed_dim: int = 256
    with_itm: bool = False      # track-token temporal module

    @staticmethod
    def vit_h() -> "SAM1Config":
        return SAM1Config()

    @staticmethod
    def tiny() -> "SAM1Config":
        return SAM1Config(image_size=128, encoder_embed_dim=32, encoder_depth=2,
                          encoder_num_heads=2, encoder_global_attn_indexes=(1,),
                          window_size=4, prompt_embed_dim=32)


# ---------------------------------------------------------------------------
# Composite
# ---------------------------------------------------------------------------
@dataclass(frozen=True)
class VideoGLaMMConfig:
    """Full composite model (reference: model/VideoGLaMM.py:84-903).

    llm_type selects the base decoder ("phi3" wired-in default; "llama3_1"
    the alternate base the reference keeps as plumbing,
    model/videogpt_plus/model/language_model/llama3_1.py)."""
    llm_type: str = "phi3"
    llm: Phi3Config = field(default_factory=Phi3Config.phi3_mini_4k)
    llama: LlamaConfig = field(default_factory=LlamaConfig.llama3_1_8b)
    clip: CLIPVisionConfig = field(default_factory=CLIPVisionConfig.vit_l_336)
    internvideo: InternVideo2Config = field(default_factory=InternVideo2Config.internvideo2_1b)
    sam2: SAM2Config = field(default_factory=SAM2Config.sam2_hiera_l)
    mm_projector_type: str = "mlp2x_gelu"
    # [SEG] projection head (text_hidden_fcs, reference VideoGLaMM.py:133-145)
    out_dim: int = 256
    seg_token_idx: int = 32064       # appended after base vocab
    num_frames: int = 16
    chunk_size: int = 4
    max_seg_tokens: int = 4          # MAX_NUM_SEG_TOKENS_PER_SAMPLE
    # loss weights (reference train_ds_with_videogptplus.py:91-93)
    ce_loss_weight: float = 1.0
    bce_loss_weight: float = 2.0
    dice_loss_weight: float = 0.5
    # pooled token grid sizes
    video_pool: Tuple[int, int] = (8, 8)      # 256 -> 64 tokens/frame
    context_pool: Tuple[int, int] = (12, 12)  # 576 -> 144 tokens/frame
    use_sam2: bool = True
    train_mask_decoder: bool = True

    @property
    def visual_prefix_len(self) -> int:
        t = self.num_frames
        ctx = t * self.context_pool[0] * self.context_pool[1]
        vid = t * self.video_pool[0] * self.video_pool[1]
        return ctx + vid  # 16*144 + 16*64 = 3328 @ T=16

    @staticmethod
    def flagship() -> "VideoGLaMMConfig":
        return VideoGLaMMConfig()

    @staticmethod
    def tiny(num_frames: int = 4) -> "VideoGLaMMConfig":
        return VideoGLaMMConfig(
            llm=Phi3Config.tiny(),
            clip=CLIPVisionConfig.tiny(),
            internvideo=_replace(InternVideo2Config.tiny(), num_frames=2),
            sam2=SAM2Config.tiny(),
            out_dim=32,
            seg_token_idx=500,
            num_frames=num_frames,
            chunk_size=2,
            video_pool=(2, 2),
            context_pool=(2, 2),
        )


# ---------------------------------------------------------------------------
# Training
# ---------------------------------------------------------------------------
@dataclass(frozen=True)
class LoRAConfig:
    """LoRA on LLM q/v projections (reference train_ds_with_videogptplus.py:279-296)."""
    r: int = 8
    alpha: int = 16
    dropout: float = 0.05
    target_modules: Tuple[str, ...] = ("q_proj", "v_proj")


@dataclass(frozen=True)
class TrainConfig:
    """Training hyperparameters (reference train_ds_with_videogptplus.py:83-97
    + utils/trainer.py:12-50)."""
    lr: float = 3e-4
    beta1: float = 0.9
    beta2: float = 0.95
    weight_decay: float = 0.0
    warmup_steps: int = 100
    total_steps: int = 5000
    grad_clip: float = 1.0
    micro_batch_size: int = 2
    grad_accum_steps: int = 10
    steps_per_epoch: int = 500
    epochs: int = 10
    lora: LoRAConfig = field(default_factory=LoRAConfig)
    precision: str = "bf16"


@dataclass(frozen=True)
class MeshConfig:
    """Device mesh layout. data axis carries DP + ZeRO sharding; model axis
    carries tensor parallelism for the towers/LLM."""
    data: int = -1     # -1 => infer from device count / model
    model: int = 1

    def resolve(self, n_devices: int) -> Tuple[int, int]:
        model = max(1, self.model)
        data = self.data if self.data > 0 else max(1, n_devices // model)
        assert data * model == n_devices, (
            f"mesh {data}x{model} != {n_devices} devices")
        return data, model
