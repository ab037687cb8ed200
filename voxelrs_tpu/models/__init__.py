from .frame import FramePipeline, build_demo_scene

__all__ = ["FramePipeline", "build_demo_scene"]
