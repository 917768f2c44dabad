import java.io.ByteArrayInputStream;
import java.awt.image.BufferedImage;
import javax.imageio.ImageIO;
import org.apache.spark.sql.api.java.UDF1;

/**
 * In-column image decode seam: bytes of any javax.imageio-readable
 * container (JPEG/PNG/GIF/BMP) -> packed pixels
 *   [w:int32 BE][h:int32 BE][h*w*3 RGB bytes, row-major]
 * or NULL when the blob does not decode (the engine's decode_ok=false
 * isolation contract — a poisoned blob must never kill the task).
 *
 * This is the JVM analogue of the file-based `image` source seam
 * (sources/readers.py:read_image_source) for blobs already inside a
 * table column — e.g. the sampled MJPEG frame chunks of the video
 * path (operators/multimodal.py:video_frame_phashes).
 */
public class DecodeImageRGB implements UDF1<byte[], byte[]> {
  static {
    // default ImageIO stream cache is a TEMP FILE per read() call —
    // catastrophic for per-row decode (measured 20x slowdown on cold
    // page cache); decode fully in memory
    ImageIO.setUseCache(false);
  }

  @Override
  public byte[] call(byte[] buf) {
    if (buf == null) return null;
    try {
      BufferedImage img = ImageIO.read(new ByteArrayInputStream(buf));
      if (img == null) return null;
      int w = img.getWidth(), h = img.getHeight();
      if (w <= 0 || h <= 0 || (long) w * h > 64L * 1024 * 1024) return null;
      byte[] out = new byte[8 + w * h * 3];
      out[0] = (byte)(w >>> 24); out[1] = (byte)(w >>> 16);
      out[2] = (byte)(w >>> 8);  out[3] = (byte) w;
      out[4] = (byte)(h >>> 24); out[5] = (byte)(h >>> 16);
      out[6] = (byte)(h >>> 8);  out[7] = (byte) h;
      int[] px = img.getRGB(0, 0, w, h, null, 0, w);  // sRGB ARGB ints
      int p = 8;
      for (int i = 0; i < w * h; i++) {
        int v = px[i];
        out[p++] = (byte)(v >>> 16);   // R
        out[p++] = (byte)(v >>> 8);    // G
        out[p++] = (byte) v;           // B
      }
      return out;
    } catch (Exception e) {
      return null;
    } catch (OutOfMemoryError e) {
      return null;
    }
  }
}
