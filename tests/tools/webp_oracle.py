import ctypes, numpy as np
lib = ctypes.CDLL("/usr/lib/x86_64-linux-gnu/libwebp.so.7")
lib.WebPEncodeRGB.restype = ctypes.c_size_t
lib.WebPEncodeRGB.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                              ctypes.c_float, ctypes.POINTER(ctypes.c_void_p)]
lib.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_uint8)
lib.WebPDecodeYUV.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                              ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
                              ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(ctypes.c_void_p),
                              ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
lib.WebPDecodeRGB.restype = ctypes.POINTER(ctypes.c_uint8)
lib.WebPDecodeRGB.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                              ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
lib.WebPFree.argtypes = [ctypes.c_void_p]

def enc(img, q=75.0):
    h, w, _ = img.shape
    out = ctypes.c_void_p()
    n = lib.WebPEncodeRGB(img.ctypes.data, w, h, w*3, q, ctypes.byref(out))
    assert n > 0
    data = ctypes.string_at(out.value, n); lib.WebPFree(out)
    return data

def dec_yuv(data):
    w = ctypes.c_int(); h = ctypes.c_int()
    up = ctypes.c_void_p(); vp = ctypes.c_void_p()
    st = ctypes.c_int(); uvst = ctypes.c_int()
    yp = lib.WebPDecodeYUV(data, len(data), ctypes.byref(w), ctypes.byref(h),
                           ctypes.byref(up), ctypes.byref(vp), ctypes.byref(st), ctypes.byref(uvst))
    if not yp: raise RuntimeError("libwebp decode failed")
    W, H = w.value, h.value
    y = np.ctypeslib.as_array(yp, shape=(H, st.value))[:, :W].copy()
    cw, chh = (W+1)//2, (H+1)//2
    u = np.ctypeslib.as_array(ctypes.cast(up, ctypes.POINTER(ctypes.c_uint8)), shape=(chh, uvst.value))[:, :cw].copy()
    v = np.ctypeslib.as_array(ctypes.cast(vp, ctypes.POINTER(ctypes.c_uint8)), shape=(chh, uvst.value))[:, :cw].copy()
    lib.WebPFree(ctypes.cast(yp, ctypes.c_void_p))
    return y, u, v

def dec_rgb(data):
    w = ctypes.c_int(); h = ctypes.c_int()
    p = lib.WebPDecodeRGB(data, len(data), ctypes.byref(w), ctypes.byref(h))
    if not p: raise RuntimeError("libwebp decode failed")
    a = np.ctypeslib.as_array(p, shape=(h.value, w.value, 3)).copy()
    lib.WebPFree(ctypes.cast(p, ctypes.c_void_p))
    return a

def vp8_payload(data):
    i = 12
    while i < len(data):
        tag = data[i:i+4]; n = int.from_bytes(data[i+4:i+8], 'little')
        if tag == b'VP8 ': return data[i+8:i+8+n]
        i += 8 + n + (n & 1)
    raise ValueError("no VP8 chunk")

def wrap_vp8(payload):
    chunk = b"VP8 " + len(payload).to_bytes(4, 'little') + payload
    if len(payload) & 1: chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + len(riff).to_bytes(4, 'little') + riff
