"""Generic semantic-segmentation trainer (SURVEY.md R13).

TPU-native re-implementation of the reference's upstream jfzhang95
VOC/SBD/COCO/Cityscapes DeepLabV3+ trainer
(/root/reference/refinenet/deeplab/train.py + utils/ + dataloaders/):
host-side numpy/PIL data pipeline feeding NHWC batches, one fused jitted
XLA program per train step (forward + loss + SGD update + BN stats), and
data parallelism via a device mesh with GSPMD-synchronized batch norm.
"""
