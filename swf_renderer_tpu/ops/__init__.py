"""swf_renderer_tpu.ops subpackage."""
