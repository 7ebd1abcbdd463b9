package graft.core

import org.apache.commons.codec.language.DoubleMetaphone

/** DoubleMetaphone phonetic chain — the reference's
  * `phonetic/DoubleMetaphoneFilter.java:28` delegates the ENCODING to
  * `org.apache.commons.codec.language.DoubleMetaphone` (commons-codec ships
  * on this platform's classpath just as it ships with the reference); what
  * the filter owns is the token-graph shape, re-expressed here verbatim:
  *
  *  - inject=true: the original token survives and the primary code (when
  *    non-empty and different from the token) plus the alternate code (when
  *    different from the primary) stack at the SAME position;
  *  - inject=false: the codes replace the token (alternate at posInc 0);
  *    a token whose primary code is empty or equals the token itself passes
  *    through unchanged (the non-convertible-strings contract);
  *  - the alternate is only considered when the primary differed from the
  *    token (`DoubleMetaphoneFilter.java:86-89`).
  *
  * Behavior pinned to the reference's own TestDoubleMetaphoneFilter vectors
  * in PhoneticSpec. BeiderMorse / DaitchMokotoff stay declared non-goals
  * (rule-asset-driven, SURVEY §7.4). */
final case class DoubleMetaphoneAnalyzer(maxCodeLength: Int = 4,
                                         inject: Boolean = true) extends Analyzer {
  override val name = s"double-metaphone:$maxCodeLength:$inject"
  @transient private lazy val encoder = {
    val e = new DoubleMetaphone()
    e.setMaxCodeLen(maxCodeLength)
    e
  }

  override def tokenize(text: String): IndexedSeq[Token] = {
    val out = Vector.newBuilder[Token]
    tokenizeRaw(text, (src, s, e, pos) => out += Token(src.substring(s, e), pos))
    out.result()
  }

  override def tokenizeRaw(text: String, sink: TokenSink): Unit = {
    var pos = 0
    SnowballAnalyzers.standardRawTokens(text).foreach { raw =>
      val lower = raw.toLowerCase(java.util.Locale.ROOT)
      val primary = encoder.doubleMetaphone(lower)
      val alternate = encoder.doubleMetaphone(lower, true)
      val primaryFires = primary != null && primary.nonEmpty && primary != lower
      val alternateFires = primaryFires && alternate != null &&
        alternate.nonEmpty && alternate != primary
      def emit(t: String): Unit = sink.accept(t, 0, t.length, pos)
      if (inject) {
        emit(lower)
        if (primaryFires) emit(primary)
        if (alternateFires) emit(alternate)
      } else {
        if (primaryFires) emit(primary) else emit(lower)
        if (alternateFires) emit(alternate)
      }
      pos += 1
    }
  }
}
