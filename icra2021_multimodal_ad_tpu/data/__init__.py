"""Data layer: CSV-shard dataset manager, multimodal feature build, ETL,
synthetic fixtures, streaming."""

from icra2021_multimodal_ad_tpu.data.dataset import (  # noqa: F401
    TabularDataset,
    TabularDatasetManager,
    ArrayLoader,
    get_loaders,
    get_balance,
)
