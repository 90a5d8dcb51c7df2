"""Data layer: numpy-native MNIST/CIFAR-10 loaders."""
from .datasets import (
    load_dataset,
    get_data_loader,
    get_real_images,
    DataLoader,
)
