"""swf_renderer_tpu.parallel subpackage."""
