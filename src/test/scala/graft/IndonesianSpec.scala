package graft

import graft.core.{Analyzers, IndonesianAnalyzer, IndonesianStem}
import org.scalatest.funsuite.AnyFunSuite

/** Indonesian stemmer pinned to the reference's complete unit vectors
  * (`TestIndonesianStemmer.java:62-144`) — derivational interactions
  * (prefix-flag suffix blocking, the meny/peny/pen+vowel substitutions,
  * belajar/pelajar specials), inflectional-only mode, and the
  * shouldn't-stem guards. */
class IndonesianSpec extends AnyFunSuite {

  private val derivational = Seq(
    "bukukah" -> "buku", "adalah" -> "ada", "bukupun" -> "buku",
    "bukuku" -> "buku", "bukumu" -> "buku", "bukunya" -> "buku",
    "mengukur" -> "ukur", "menyapu" -> "sapu", "menduga" -> "duga",
    "menuduh" -> "uduh", "membaca" -> "baca", "merusak" -> "rusak",
    "pengukur" -> "ukur", "penyapu" -> "sapu", "penduga" -> "duga",
    "pembaca" -> "baca", "diukur" -> "ukur", "tersapu" -> "sapu",
    "kekasih" -> "kasih", "berlari" -> "lari", "belajar" -> "ajar",
    "bekerja" -> "kerja", "perjelas" -> "jelas", "pelajar" -> "ajar",
    "pekerja" -> "kerja", "tarikkan" -> "tarik", "ambilkan" -> "ambil",
    "mengambilkan" -> "ambil", "makanan" -> "makan", "janjian" -> "janji",
    "perjanjian" -> "janji", "tandai" -> "tanda", "dapati" -> "dapat",
    "mendapati" -> "dapat", "pantai" -> "panta",
    "penyalahgunaan" -> "salahguna", "menyalahgunakan" -> "salahguna",
    "disalahgunakan" -> "salahguna",
    "pertanggungjawaban" -> "tanggungjawab",
    "mempertanggungjawabkan" -> "tanggungjawab",
    "dipertanggungjawabkan" -> "tanggungjawab",
    "pelaksanaan" -> "laksana", "pelaksana" -> "laksana",
    "melaksanakan" -> "laksana", "dilaksanakan" -> "laksana",
    "melibatkan" -> "libat", "terlibat" -> "libat",
    "penculikan" -> "culik", "menculik" -> "culik", "diculik" -> "culik",
    "penculik" -> "culik", "perubahan" -> "ubah", "peledakan" -> "ledak",
    "penanganan" -> "tangan", "kepolisian" -> "polisi",
    "kenaikan" -> "naik", "bersenjata" -> "senjata",
    "penyelewengan" -> "seleweng", "kecelakaan" -> "celaka",
    // shouldn't-stem guards
    "gigi" -> "gigi")

  test("derivational stemming matches the reference vectors") {
    derivational.foreach { case (in, want) =>
      assert(IndonesianStem.stem(in) == want, s"stem($in)")
    }
  }

  test("inflectional-only mode (stemDerivational = false)") {
    val vectors = Seq(
      "bukunya" -> "buku", "bukukah" -> "buku",
      "bukunyakah" -> "buku", "dibukukannya" -> "dibukukan")
    vectors.foreach { case (in, want) =>
      assert(IndonesianStem.stem(in, stemDerivational = false) == want, s"inflectional($in)")
    }
  }

  test("chain + registry") {
    val toks = IndonesianAnalyzer().tokenize("mereka membaca bukunya")
    // "mereka" is a stop word; positions keep increments
    assert(toks.map(_.term) == Vector("baca", "buku"))
    assert(toks.map(_.position) == Vector(1, 2))
    assert(Analyzers.byName("indonesian").isInstanceOf[IndonesianAnalyzer])
    assert(!Analyzers.byName("indonesian-inflectional")
      .asInstanceOf[IndonesianAnalyzer].stemDerivational)
  }
}
