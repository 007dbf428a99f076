"""Model zoo: every architecture of the reference, rebuilt TPU-first.

Source of truth for the architecture specs is /root/reference/models.lua
(cited per constructor). Differences by design:

  * NHWC layout (TPU lane dim = channels) instead of NCHW;
  * every {SpatialUpSamplingNearest(2) + SpatialConvolution} pair in the G
    decoders is the fused collapsed-weight ``UpsampleConv``
    (catgen/kernels/upsample_conv.py) — 2.25-2.78x fewer MACs, no 4x
    intermediate;
  * no ``nn.Copy`` device-transport layers — device placement is jax-native;
  * the spatial-transformer sampler runs on-device and deterministic (the
    reference pinned it to CPU for reproducibility, models.lua:888-902);
  * architecture selection is an explicit registry key instead of a code
    edit (SURVEY.md §5.6).

All constructors default to heuristic weight init, matching the reference
(every create_* ends with weight-init 'heuristic', e.g. models.lua:225,708).

Image shapes are (H, W, C); G input is (N, noise_dim); D/V input (N,H,W,C).
"""

from __future__ import annotations

from typing import Optional, Tuple

from catgen.core.module import Module, Sequential
from catgen.kernels.upsample_conv import UpsampleConv
from catgen.nn.fused import FusedDecoderSequential
from catgen.nn.layers import (AvgPool, BatchNorm, Conv, Dense, Dropout,
                              Flatten, LeakyReLU, MaxPool, PReLU, Reshape,
                              Sigmoid, Softmax, SpatialDropout)
from catgen.nn.spatial_transformer import (FusedSTBranches,
                                            FusedSTConvPReLU,
                                            SpatialTransformer)

ImageShape = Tuple[int, int, int]  # (H, W, C)


def _bn(axis_name: Optional[str]) -> BatchNorm:
    return BatchNorm(axis_name=axis_name)


# ---------------------------------------------------------------------------
# G decoders (the generators)
# ---------------------------------------------------------------------------


def create_G_decoder(image: ImageShape, noise_dim: int,
                     axis_name: Optional[str] = None) -> Module:
    """MLP decoder (models.lua:89-102)."""
    h, w, c = image
    return Sequential([
        Dense(1024), PReLU(),
        Dense(h * w * c), Sigmoid(),
        Reshape((h, w, c)),
    ], name="G_mlp")


def create_G_decoder_upsampling16(image: ImageShape, noise_dim: int,
                                  axis_name: Optional[str] = None) -> Module:
    """4x4 seed -> 2 fused upsample-conv stages -> 16x16 (models.lua:108-132)."""
    h, w, c = image
    assert (h, w) == (16, 16)
    return FusedDecoderSequential([
        Dense(128 * 4 * 4), Reshape((4, 4, 128)), PReLU(),
        UpsampleConv(256, (5, 5)), _bn(axis_name), PReLU(),
        UpsampleConv(128, (5, 5)), _bn(axis_name), PReLU(),
        Conv(c, (3, 3)), Sigmoid(),
    ], name="G16up")


def create_G_decoder_upsampling32(image: ImageShape, noise_dim: int,
                                  axis_name: Optional[str] = None) -> Module:
    """'G32up': 8x8 seed -> 2 fused upsample-conv stages -> 32x32
    (models.lua:138-160)."""
    h, w, c = image
    assert (h, w) == (32, 32)
    return FusedDecoderSequential([
        Dense(128 * 8 * 8), Reshape((8, 8, 128)), PReLU(),
        UpsampleConv(256, (5, 5)), _bn(axis_name), PReLU(),
        UpsampleConv(128, (5, 5)), _bn(axis_name), PReLU(),
        Conv(c, (3, 3)), Sigmoid(),
    ], name="G32up")


def create_G_decoder_upsampling32b(image: ImageShape, noise_dim: int,
                                   axis_name: Optional[str] = None) -> Module:
    """'G32up-b': 4x4x512 seed, 3 upsample stages (models.lua:162-194)."""
    h, w, c = image
    assert (h, w) == (32, 32)
    return FusedDecoderSequential([
        Dense(512 * 4 * 4), _bn(axis_name), PReLU(), Reshape((4, 4, 512)),
        UpsampleConv(512, (3, 3)), _bn(axis_name), PReLU(),
        UpsampleConv(256, (3, 3)), _bn(axis_name), PReLU(),
        UpsampleConv(128, (5, 5)), _bn(axis_name), PReLU(),
        Conv(c, (5, 5)), Sigmoid(),
    ], name="G32up_b")


def create_G_decoder_upsampling32c(image: ImageShape, noise_dim: int,
                                   axis_name: Optional[str] = None) -> Module:
    """'G32up-c', the reference's current default G (models.lua:196-228,
    selected at 234-240): like 32b but no BN on the seed projection and a
    3x3 output conv."""
    h, w, c = image
    assert (h, w) == (32, 32)
    return FusedDecoderSequential([
        Dense(512 * 4 * 4), PReLU(), Reshape((4, 4, 512)),
        UpsampleConv(512, (3, 3)), _bn(axis_name), PReLU(),
        UpsampleConv(256, (3, 3)), _bn(axis_name), PReLU(),
        UpsampleConv(128, (5, 5)), _bn(axis_name), PReLU(),
        Conv(c, (3, 3)), Sigmoid(),
    ], name="G32up_c")


def create_G(image: ImageShape, noise_dim: int,
             axis_name: Optional[str] = None) -> Module:
    """Default G selection (models.lua:234-240): 16px -> upsampling16,
    else upsampling32c."""
    if image[0] == 16:
        return create_G_decoder_upsampling16(image, noise_dim, axis_name)
    return create_G_decoder_upsampling32c(image, noise_dim, axis_name)


# ---------------------------------------------------------------------------
# G encoders + autoencoder (for MSE pretraining, pretrain_g.lua)
# ---------------------------------------------------------------------------


def create_G_encoder16(image: ImageShape, noise_dim: int,
                       axis_name: Optional[str] = None) -> Module:
    """models.lua:14-44. Note: the reference's flatten size there uses
    0.25^3 with only two pools — a latent bug (the constructor is unused at
    16px); we use the correct size."""
    return Sequential([
        Conv(32, (3, 3)), _bn(axis_name), LeakyReLU(),
        Conv(32, (3, 3)), _bn(axis_name), LeakyReLU(),
        MaxPool(2),
        Conv(64, (3, 3)), _bn(axis_name), LeakyReLU(),
        MaxPool(2),
        Conv(64, (3, 3)), _bn(axis_name), LeakyReLU(),
        Flatten(),
        Dense(512), _bn(axis_name), LeakyReLU(),
        Dense(noise_dim),
    ], name="G_enc16")


def create_G_encoder32(image: ImageShape, noise_dim: int,
                       axis_name: Optional[str] = None) -> Module:
    """models.lua:50-83."""
    return Sequential([
        Conv(16, (3, 3)), _bn(axis_name), LeakyReLU(), MaxPool(2),
        Conv(16, (3, 3)), _bn(axis_name), LeakyReLU(), MaxPool(2),
        Conv(32, (3, 3)), _bn(axis_name), LeakyReLU(), MaxPool(2),
        Conv(32, (3, 3)), _bn(axis_name), LeakyReLU(),
        Flatten(),
        Dense(1024), _bn(axis_name), LeakyReLU(),
        Dense(noise_dim),
    ], name="G_enc32")


def create_G_autoencoder(image: ImageShape, noise_dim: int,
                         axis_name: Optional[str] = None) -> Module:
    """Encoder + decoder composition (models.lua:246-262). Child 1 (the
    decoder) is exported standalone by the pretrainer."""
    if image[0] == 16:
        enc = create_G_encoder16(image, noise_dim, axis_name)
        dec = create_G_decoder_upsampling16(image, noise_dim, axis_name)
    else:
        enc = create_G_encoder32(image, noise_dim, axis_name)
        dec = create_G_decoder_upsampling32c(image, noise_dim, axis_name)
    return Sequential([enc, dec], name="G_autoencoder")


# ---------------------------------------------------------------------------
# D variants
# ---------------------------------------------------------------------------


def create_D16(image: ImageShape, axis_name: Optional[str] = None) -> Module:
    """models.lua:279-314."""
    return Sequential([
        Conv(128, (3, 3)), PReLU(),
        Conv(128, (3, 3)), PReLU(), MaxPool(2),
        Conv(256, (3, 3)), PReLU(),
        Conv(1024, (3, 3)), PReLU(), MaxPool(2),
        SpatialDropout(0.5),
        Flatten(),
        Dense(1024), PReLU(), Dropout(0.5),
        Dense(1024), PReLU(), Dropout(0.5),
        Dense(1), Sigmoid(),
    ], name="D16")


def create_D16b(image: ImageShape, axis_name: Optional[str] = None) -> Module:
    """models.lua:316-360."""
    return Sequential([
        Conv(64, (3, 3)), PReLU(), SpatialDropout(0.2),
        Conv(64, (3, 3)), PReLU(), MaxPool(2), SpatialDropout(0.2),
        Conv(128, (3, 3)), PReLU(), SpatialDropout(0.2),
        Conv(128, (3, 3)), PReLU(), MaxPool(2), SpatialDropout(0.5),
        Flatten(),
        Dense(1024), PReLU(), Dropout(0.5),
        Dense(1024), PReLU(), Dropout(0.5),
        Dense(1), Sigmoid(),
    ], name="D16b")


def create_D32(image: ImageShape, axis_name: Optional[str] = None) -> Module:
    """models.lua:362-400."""
    return Sequential([
        Conv(64, (3, 3)), PReLU(), AvgPool(2),
        Conv(128, (3, 3)), PReLU(), MaxPool(2), Dropout(0.5),
        Conv(256, (5, 5)), PReLU(),
        Conv(256, (5, 5)), PReLU(), MaxPool(2), SpatialDropout(0.5),
        Flatten(),
        Dense(1024), PReLU(), Dropout(0.5),
        Dense(1024), PReLU(), Dropout(0.5),
        Dense(1), Sigmoid(),
    ], name="D32")


def create_D32b(image: ImageShape, axis_name: Optional[str] = None) -> Module:
    """models.lua:402-442."""
    return Sequential([
        Conv(128, (3, 3)), PReLU(), AvgPool(2),
        Conv(128, (3, 3)), PReLU(), MaxPool(2), Dropout(0.5),
        Conv(256, (5, 5)), PReLU(),
        Conv(512, (5, 5)), PReLU(), MaxPool(2),
        Conv(512, (5, 5)), PReLU(), SpatialDropout(0.5),
        Flatten(),
        Dense(1024), PReLU(), Dropout(0.5),
        Dense(1024), PReLU(), Dropout(0.5),
        Dense(1), Sigmoid(),
    ], name="D32b")


def create_D32c(image: ImageShape, axis_name: Optional[str] = None) -> Module:
    """models.lua:444-484."""
    return Sequential([
        Conv(128, (3, 3)), PReLU(), AvgPool(2),
        Conv(128, (3, 3)), PReLU(), MaxPool(2), Dropout(0.5),
        Conv(256, (5, 5)), PReLU(),
        Conv(256, (5, 5)), PReLU(), MaxPool(2),
        Conv(256, (5, 5)), PReLU(), SpatialDropout(0.5),
        Flatten(),
        Dense(512), PReLU(), Dropout(0.5),
        Dense(512), PReLU(), Dropout(0.5),
        Dense(1), Sigmoid(),
    ], name="D32c")


def create_D32d(image: ImageShape, axis_name: Optional[str] = None) -> Module:
    """models.lua:486-524."""
    return Sequential([
        Conv(128, (3, 3)), PReLU(), AvgPool(2),
        Conv(128, (3, 3)), PReLU(), AvgPool(2),
        Conv(256, (3, 3)), PReLU(),
        Conv(256, (3, 3)), PReLU(), AvgPool(2), SpatialDropout(0.5),
        Flatten(),
        Dense(512), PReLU(), Dropout(0.5),
        Dense(512), PReLU(), Dropout(0.5),
        Dense(1), Sigmoid(),
    ], name="D32d")


def create_D32e(image: ImageShape, axis_name: Optional[str] = None) -> Module:
    """models.lua:526-569."""
    return Sequential([
        Conv(128, (3, 3)), PReLU(), SpatialDropout(0.2), AvgPool(2),
        Conv(128, (3, 3)), PReLU(), SpatialDropout(0.2), AvgPool(2),
        Conv(256, (3, 3)), PReLU(), SpatialDropout(0.2), AvgPool(2),
        Conv(256, (3, 3)), PReLU(), SpatialDropout(0.5),
        Flatten(),
        Dense(1024), PReLU(), Dropout(0.5),
        Dense(512), PReLU(), Dropout(0.5),
        Dense(1), Sigmoid(),
    ], name="D32e")


def _st_branch_tail() -> Sequential:
    """A D32_st3 transformer-branch tail (models.lua:653-678, after its
    ST): conv64 -> PReLU -> maxpool -> SpatialDropout(0.2) -> conv64 ->
    PReLU. The ST sampling itself is fused across the three branches
    (FusedSTBranches)."""
    return Sequential([
        Conv(64, (3, 3)), PReLU(), MaxPool(2), SpatialDropout(0.2),
        Conv(64, (3, 3)), PReLU(),
    ], name="st_tail")


def create_D32_st3(image: ImageShape, axis_name: Optional[str] = None) -> Module:
    """The reference's current default D (models.lua:640-711, selected at
    268-277): rotation-only ST on the input, conv stem, then a dense 4-way
    branch concat — 3 spatial-transformer branches + 1 plain conv branch."""
    branch4 = Sequential([
        Conv(128, (5, 5)), PReLU(), MaxPool(2), SpatialDropout(0.2),
        Conv(128, (7, 7)), PReLU(),
    ], name="conv_branch")
    return Sequential([
        # [ST -> conv3x3 -> PReLU] input prefix as one fusable block
        # (models.lua:643-648; CATGEN_ST_CONV picks the Pallas single-pass
        # kernel or the split composition)
        FusedSTConvPReLU(SpatialTransformer(True, False, False),
                         Conv(64, (3, 3)), PReLU()),
        Conv(64, (3, 3)), PReLU(),
        AvgPool(2), SpatialDropout(0.2),
        FusedSTBranches([_st_branch_tail(), _st_branch_tail(),
                         _st_branch_tail()], branch4),
        SpatialDropout(0.5),
        Flatten(),
        Dense(256), PReLU(), Dropout(0.5),
        Dense(1), Sigmoid(),
    ], name="D32_st3")


def _st_branch16_tail() -> Sequential:
    """A D16_st3 transformer-branch tail (models.lua:585-604): no
    pooling; ST sampling fused across branches."""
    return Sequential([
        Conv(64, (3, 3)), PReLU(),
        Conv(64, (3, 3)), PReLU(),
    ], name="st_tail")


def create_D16_st3(image: ImageShape, axis_name: Optional[str] = None) -> Module:
    """models.lua:574-635: like D32_st3 but without pooling layers."""
    branch4 = Sequential([
        Conv(128, (5, 5)), PReLU(),
        Conv(128, (7, 7)), PReLU(),
    ], name="conv_branch")
    return Sequential([
        FusedSTConvPReLU(SpatialTransformer(True, False, False),
                         Conv(64, (3, 3)), PReLU()),
        Conv(64, (3, 3)), PReLU(),
        FusedSTBranches([_st_branch16_tail(), _st_branch16_tail(),
                         _st_branch16_tail()], branch4),
        SpatialDropout(0.5),
        Flatten(),
        Dense(256), PReLU(), Dropout(0.5),
        Dense(1), Sigmoid(),
    ], name="D16_st3")


def create_D(image: ImageShape, axis_name: Optional[str] = None) -> Module:
    """Default D selection (models.lua:268-277): D32_st3 regardless of
    scale (the commented 16px path picked D16b; we keep st3 like the
    reference's live code)."""
    return create_D32_st3(image, axis_name)


# ---------------------------------------------------------------------------
# V (the GAN pseudo-validator, train_v.lua)
# ---------------------------------------------------------------------------


def create_V16(image: ImageShape, axis_name: Optional[str] = None) -> Module:
    """models.lua:724-763."""
    return Sequential([
        Conv(128, (3, 3)), LeakyReLU(),
        Conv(128, (3, 3)), _bn(axis_name), LeakyReLU(),
        MaxPool(2), SpatialDropout(0.2),
        Conv(256, (3, 3)), LeakyReLU(),
        Conv(256, (3, 3)), _bn(axis_name), LeakyReLU(),
        MaxPool(2), SpatialDropout(0.5),
        Flatten(),
        Dense(1024), _bn(axis_name), LeakyReLU(), Dropout(0.5),
        Dense(1024), _bn(axis_name), LeakyReLU(), Dropout(0.5),
        Dense(2), Softmax(),
    ], name="V16")


def create_V32(image: ImageShape, axis_name: Optional[str] = None) -> Module:
    """models.lua:765-804."""
    return Sequential([
        Conv(128, (3, 3)), LeakyReLU(), MaxPool(2),
        Conv(128, (3, 3)), _bn(axis_name), LeakyReLU(), MaxPool(2),
        Dropout(0.5),
        Conv(256, (3, 3)), LeakyReLU(),
        Conv(256, (3, 3)), _bn(axis_name), LeakyReLU(), MaxPool(2),
        SpatialDropout(0.5),
        Flatten(),
        Dense(1024), _bn(axis_name), LeakyReLU(), Dropout(0.5),
        Dense(1024), _bn(axis_name), LeakyReLU(), Dropout(0.5),
        Dense(2), Softmax(),
    ], name="V32")


def create_V(image: ImageShape, axis_name: Optional[str] = None) -> Module:
    """models.lua:716-722."""
    if image[0] == 16:
        return create_V16(image, axis_name)
    return create_V32(image, axis_name)


# ---------------------------------------------------------------------------
# registry (explicit --model selection, SURVEY.md §5.6)
# ---------------------------------------------------------------------------

G_REGISTRY = {
    "mlp": create_G_decoder,
    "g16up": create_G_decoder_upsampling16,
    "g32up": create_G_decoder_upsampling32,
    "g32up_b": create_G_decoder_upsampling32b,
    "g32up_c": create_G_decoder_upsampling32c,
    "default": create_G,
}

D_REGISTRY = {
    "d16": create_D16,
    "d16b": create_D16b,
    "d32": create_D32,
    "d32b": create_D32b,
    "d32c": create_D32c,
    "d32d": create_D32d,
    "d32e": create_D32e,
    "d16_st3": create_D16_st3,
    "d32_st3": create_D32_st3,
    "default": create_D,
}

V_REGISTRY = {
    "v16": create_V16,
    "v32": create_V32,
    "default": create_V,
}
