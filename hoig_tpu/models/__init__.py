"""Network registry (reference models/networks/__init__.py:8-36 parity)."""

from hoig_tpu.models.discriminator import MultiScaleDiscriminator, PatchDiscriminator
from hoig_tpu.models.generator import ExtractorAttn, Generator, ResNetGenerator, ResUnetGenerator
from hoig_tpu.models.vgg import Vgg19Features, load_torch_weights, vgg_perceptual_loss

# the nine lockstep layers (3 encoder downs + 6 bottleneck blocks)
_FULL_ATTN = (1, 2, 3, 4, 5, 6, 7, 8, 9)


class NetworksFactory:
    """Name -> network constructor, mirroring the reference registry."""

    @staticmethod
    def get_by_name(network_name: str, *args, **kwargs):
        if network_name == "generator_base":
            return Generator(*args, **kwargs)
        if network_name == "generator_spade":
            return Generator(*args, **kwargs, spade_layers=(1, 1, 0, 0))
        if network_name == "generator_spade_attn":
            return Generator(
                *args, **kwargs, spade_layers=(1, 1, 0, 0), attn_layers=_FULL_ATTN
            )
        if network_name == "generator_spade_attn_tiny":
            return Generator(
                *args, **kwargs, spade_layers=(0, 0, 1, 1), attn_layers=_FULL_ATTN
            )
        if network_name == "discriminator_patch_gan":
            return PatchDiscriminator(*args, **kwargs)
        raise ValueError(f"Network {network_name} not recognized.")
