import java.io.ByteArrayInputStream;
import java.io.ByteArrayOutputStream;
import javax.sound.sampled.AudioFormat;
import javax.sound.sampled.AudioInputStream;
import javax.sound.sampled.AudioSystem;
import org.apache.spark.sql.api.java.UDF1;

/**
 * In-column audio decode seam: bytes of any javax.sound.sampled-
 * readable container (WAV, AIFF, AU/SND — the JDK's built-in readers,
 * including u-law/a-law via format conversion) -> packed PCM
 *   [sample_rate:int32 BE][channels:int32 BE]
 *   [interleaved int16 little-endian samples]
 * or NULL when the blob does not decode (decode_ok=false isolation).
 *
 * The audio analogue of the image seam: foreign AIFF/AU blobs that the
 * engine's from-scratch RIFF/PCM codec (functions/wav.py) rejects are
 * decoded INSIDE the JVM and feed the same fingerprint machinery
 * (operators/multimodal.py:extract_audio_features).
 */
public class DecodeAudioPCM implements UDF1<byte[], byte[]> {
  @Override
  public byte[] call(byte[] buf) {
    if (buf == null) return null;
    try {
      AudioInputStream in =
          AudioSystem.getAudioInputStream(new ByteArrayInputStream(buf));
      AudioFormat f = in.getFormat();
      AudioFormat target = new AudioFormat(
          f.getSampleRate(), 16, f.getChannels(), true, false);
      AudioInputStream pcm = AudioSystem.getAudioInputStream(target, in);
      ByteArrayOutputStream bos = new ByteArrayOutputStream();
      int sr = Math.round(f.getSampleRate());
      int ch = f.getChannels();
      bos.write(new byte[] {
          (byte)(sr >>> 24), (byte)(sr >>> 16), (byte)(sr >>> 8), (byte) sr,
          (byte)(ch >>> 24), (byte)(ch >>> 16), (byte)(ch >>> 8), (byte) ch});
      byte[] chunk = new byte[1 << 16];
      long total = 0;
      int n;
      while ((n = pcm.read(chunk)) > 0) {
        total += n;
        if (total > 512L * 1024 * 1024) return null;  // runaway stream
        bos.write(chunk, 0, n);
      }
      if (total == 0) return null;
      return bos.toByteArray();
    } catch (Exception e) {
      return null;
    } catch (OutOfMemoryError e) {
      return null;
    }
  }
}
