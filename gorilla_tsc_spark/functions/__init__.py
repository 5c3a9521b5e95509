from .channels import Channel, agg_channel_names, default_channels

__all__ = ["Channel", "default_channels", "agg_channel_names"]
