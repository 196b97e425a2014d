"""swf_renderer_tpu.models subpackage."""
