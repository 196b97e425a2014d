"""swf_renderer_tpu.runtime subpackage."""
