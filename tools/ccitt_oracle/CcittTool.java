// JDK-ImageIO CCITT oracle for the pure-Python T.4/T.6 codecs
// (rawdata_client_provider_gcs_spark/operators/rawccitt.py).
//
//   encode <in.raw> <out.tiff> <type>   type: "CCITT RLE"|"CCITT T.4"|"CCITT T.6"
//   decode <in.tiff> <out.raw>
//
// raw format: 8-byte ASCII header "W H\n" padded, then one byte per
// pixel, 1 = black, 0 = white, row-major.
import javax.imageio.*;
import javax.imageio.stream.*;
import java.awt.image.*;
import java.io.*;
import java.nio.file.*;
import java.util.Iterator;

public class CcittTool {
  public static void main(String[] args) throws Exception {
    if (args[0].equals("encode")) encode(args[1], args[2], args[3]);
    else decode(args[1], args[2]);
  }

  static void encode(String inPath, String outPath, String type) throws Exception {
    byte[] raw = Files.readAllBytes(Paths.get(inPath));
    String hdr = new String(raw, 0, 16).trim();
    String[] wh = hdr.split(" ");
    int w = Integer.parseInt(wh[0]), h = Integer.parseInt(wh[1]);
    BufferedImage img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_BINARY);
    for (int y = 0; y < h; y++)
      for (int x = 0; x < w; x++) {
        int black = raw[16 + y * w + x];
        img.setRGB(x, y, black == 1 ? 0x000000 : 0xFFFFFF);
      }
    Iterator<ImageWriter> it = ImageIO.getImageWritersByFormatName("TIFF");
    ImageWriter wr = it.next();
    ImageWriteParam p = wr.getDefaultWriteParam();
    p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT);
    p.setCompressionType(type);
    try (ImageOutputStream os = ImageIO.createImageOutputStream(new File(outPath))) {
      wr.setOutput(os);
      wr.write(null, new IIOImage(img, null, null), p);
    }
    wr.dispose();
  }

  static void decode(String inPath, String outPath) throws Exception {
    BufferedImage img = ImageIO.read(new File(inPath));
    int w = img.getWidth(), h = img.getHeight();
    byte[] out = new byte[16 + w * h];
    byte[] hdr = String.format("%-15s\n", w + " " + h).getBytes();
    System.arraycopy(hdr, 0, out, 0, 16);
    for (int y = 0; y < h; y++)
      for (int x = 0; x < w; x++)
        out[16 + y * w + x] = (byte) (((img.getRGB(x, y) & 0xFF) < 128) ? 1 : 0);
    Files.write(Paths.get(outPath), out);
  }
}
