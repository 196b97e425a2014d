"""swf_renderer_tpu.native subpackage."""
