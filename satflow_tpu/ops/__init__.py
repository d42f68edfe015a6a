"""Numerical ops: SSIM/MS-SSIM, optical flow, image warping, Pallas kernels."""
