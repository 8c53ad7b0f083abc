"""Explainability: G3D-ViT Grad-CAM, ResNet CAMs, integrated gradients, SHAP."""
