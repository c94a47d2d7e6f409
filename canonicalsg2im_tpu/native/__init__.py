from canonicalsg2im_tpu.native.build import load_cocomask
