"""Evaluation judges: exploration coverage (action replay) and map quality
(PSNR / MS-SSIM / depth-L1 / ATE)."""
