"""swf_renderer_tpu.utils subpackage."""
