from qaray_tpu.scene.xml_parser import load_scene
from qaray_tpu.scene.compiler import compile_scene
