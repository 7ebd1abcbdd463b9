package graft.core

/** Galician analysis chain — a re-expression of the reference's RSLP-based
  * stemmer (`gl/GalicianStemmer.java:47` driving the published
  * "Regras do lematizador para o galego" rule set
  * `resources/.../gl/galician.rslp`, parsed by `pt/RSLPStemmerBase.java:218`).
  * The rule DATA below is the published RSLP-G table (the identity IS the
  * correctness requirement — stemmed queries must hit stemmed index terms);
  * the ENGINE is re-expressed on immutable Strings: a step is an ordered
  * first-match rule list behind a min-word-length gate and optional entry
  * suffixes; a rule strips a suffix when the remaining stem is long enough
  * and the word is not in its exception list (whole-word or ends-with per
  * step). Full parity with the reference over ~11.6k generated vectors is
  * pinned in GalicianBrazilianSpec. */

/** One RSLP rule: strip `suffix` when the stem (before appending
  * `replacement`) keeps at least `min` chars and no exception matches. */
final case class RslpRule(suffix: String, min: Int, replacement: String,
                          exceptions: Array[String])

/** One RSLP step (`RSLPStemmerBase.Step.apply`): gate on word length and
  * optional entry suffixes, then fire the FIRST matching rule only. An
  * exception hit makes the rule non-matching — later rules still run. */
final case class RslpStep(min: Int, suffixes: Array[String],
                          wholeWordExceptions: Boolean, rules: Array[RslpRule]) {
  def apply(s: String): String = {
    if (s.length < min) return s
    if (suffixes.nonEmpty && !suffixes.exists(s.endsWith)) return s
    var i = 0
    while (i < rules.length) {
      val r = rules(i)
      if (s.length - r.suffix.length >= r.min && s.endsWith(r.suffix)) {
        val excluded =
          if (wholeWordExceptions) r.exceptions.contains(s)
          else r.exceptions.exists(s.endsWith)
        if (!excluded)
          return s.substring(0, s.length - r.suffix.length) + r.replacement
      }
      i += 1
    }
    s
  }
}

object GalicianStem extends Serializable {
  private val stepPlural = RslpStep(3, Array("s"), wholeWordExceptions = true, Array(
    RslpRule("ns", 1, "n", Array("luns", "furatapóns", "furatapons")),
    RslpRule("ós", 3, "ón", Array()),
    RslpRule("ões", 3, "ón", Array()),
    RslpRule("ães", 1, "ão", Array("mães", "magalhães")),
    RslpRule("ais", 2, "al", Array("cais", "tais", "mais", "pais", "ademais")),
    RslpRule("áis", 2, "al", Array("cáis", "táis", "máis", "páis", "ademáis")),
    RslpRule("éis", 2, "el", Array()),
    RslpRule("eis", 2, "el", Array()),
    RslpRule("óis", 2, "ol", Array("escornabóis")),
    RslpRule("ois", 2, "ol", Array("escornabois")),
    RslpRule("ís", 2, "il", Array("país")),
    RslpRule("is", 2, "il", Array("menfis", "pais", "kinguis")),
    RslpRule("les", 2, "l", Array("ingles", "marselles", "montreales", "senegales", "manizales", "móstoles", "nápoles")),
    RslpRule("res", 3, "r", Array("petres", "henares", "cáceres", "baleares", "linares", "londres", "mieres", "miraflores", "mércores", "venres", "pires")),
    RslpRule("ces", 2, "z", Array()),
    RslpRule("zes", 2, "z", Array()),
    RslpRule("ises", 3, "z", Array()),
    RslpRule("ás", 1, "al", Array("más")),
    RslpRule("ses", 2, "s", Array()),
    RslpRule("s", 2, "", Array("barbadés", "barcelonés", "cantonés", "gabonés", "llanés", "medinés", "escocés", "escocês", "francês", "barcelonês", "cantonês", "macramés", "reves", "barcelones", "cantones", "gabones", "llanes", "magallanes", "medines", "escoces", "frances", "xoves", "martes", "aliás", "pires", "lápis", "cais", "mais", "mas", "menos", "férias", "pêsames", "crúcis", "país", "cangas", "atenas", "asturias", "canarias", "filipinas", "honduras", "molucas", "caldas", "mascareñas", "micenas", "covarrubias", "psoas", "óculos", "nupcias", "xoves", "martes", "llanes"))
  ))

  private val stepUnification = RslpStep(3, Array(), wholeWordExceptions = false, Array(
    RslpRule("íssimo", 5, "ísimo", Array()),
    RslpRule("íssima", 5, "ísima", Array()),
    RslpRule("aço", 4, "azo", Array()),
    RslpRule("aça", 4, "aza", Array()),
    RslpRule("uça", 4, "uza", Array()),
    RslpRule("lhar", 2, "llar", Array()),
    RslpRule("lher", 2, "ller", Array()),
    RslpRule("lhor", 2, "llor", Array()),
    RslpRule("lho", 1, "llo", Array()),
    RslpRule("nhar", 2, "ñar", Array()),
    RslpRule("nhor", 2, "ñor", Array()),
    RslpRule("nho", 1, "ño", Array()),
    RslpRule("nha", 1, "ña", Array()),
    RslpRule("ário", 3, "ario", Array()),
    RslpRule("ária", 3, "aria", Array()),
    RslpRule("able", 2, "ábel", Array()),
    RslpRule("ável", 2, "ábel", Array()),
    RslpRule("ible", 2, "íbel", Array()),
    RslpRule("ível", 2, "íbel", Array()),
    RslpRule("çom", 2, "ción", Array()),
    RslpRule("agem", 2, "axe", Array()),
    RslpRule("age", 2, "axe", Array()),
    RslpRule("ão", 3, "ón", Array()),
    RslpRule("ao", 1, "án", Array()),
    RslpRule("au", 1, "án", Array()),
    RslpRule("om", 3, "ón", Array()),
    RslpRule("m", 2, "n", Array())
  ))

  private val stepAdverb = RslpStep(9, Array(), wholeWordExceptions = false, Array(
    RslpRule("mente", 4, "", Array("experimente", "vehemente", "sedimente"))
  ))

  private val stepAugmentative = RslpStep(5, Array(), wholeWordExceptions = true, Array(
    RslpRule("dísimo", 5, "", Array()),
    RslpRule("dísima", 5, "", Array()),
    RslpRule("bilísimo", 3, "", Array()),
    RslpRule("bilísima", 3, "", Array()),
    RslpRule("ísimo", 3, "", Array()),
    RslpRule("ísima", 3, "", Array()),
    RslpRule("ésimo", 3, "", Array()),
    RslpRule("ésima", 3, "", Array()),
    RslpRule("érrimo", 4, "", Array()),
    RslpRule("érrima", 4, "", Array()),
    RslpRule("ana", 2, "", Array("argana", "banana", "choupana", "espadana", "faciana", "iguana", "lantana", "macana", "membrana", "mesana", "nirvana", "obsidiana", "palangana", "pavana", "persiana", "pestana", "porcelana", "pseudomembrana", "roldana", "sábana", "salangana", "saragana", "ventana")),
    RslpRule("án", 3, "", Array("ademán", "bardán", "barregán", "corricán", "curricán", "faisán", "furacán", "fustán", "gabán", "gabián", "galán", "gañán", "lavacán", "mazán", "mourán", "rabadán", "serán", "serrán", "tabán", "titán", "tobogán", "verán", "volcán", "volován")),
    RslpRule("azo", 4, "", Array("abrazo", "espazo", "andazo", "bagazo", "balazo", "bandazo", "cachazo", "carazo", "denazo", "engazo", "famazo", "lampreazo", "pantocazo", "pedazo", "preñazo", "regazo", "ribazo", "sobrazo", "terrazo", "trompazo")),
    RslpRule("aza", 3, "", Array("alcarraza", "ameaza", "baraza", "broucaza", "burgaza", "cabaza", "cachaza", "calaza", "carpaza", "carraza", "coiraza", "colmaza", "fogaza", "famaza", "labaza", "liñaza", "melaza", "mordaza", "paraza", "pinaza", "rabaza", "rapaza", "trancaza")),
    RslpRule("allo", 4, "", Array("traballo")),
    RslpRule("alla", 4, "", Array()),
    RslpRule("arra", 3, "", Array("cigarra", "cinzarra")),
    RslpRule("astro", 3, "", Array("balastro", "bimbastro", "canastro", "retropilastro")),
    RslpRule("astra", 3, "", Array("banastra", "canastra", "contrapilastra", "piastra", "pilastra")),
    RslpRule("ázio", 3, "", Array("topázio")),
    RslpRule("elo", 4, "", Array("bacelo", "barrelo", "bicarelo", "biquelo", "boquelo", "botelo", "bouquelo", "cacarelo", "cachelo", "cadrelo", "campelo", "candelo", "cantelo", "carabelo", "carambelo", "caramelo", "cercelo", "cerebelo", "chocarelo", "coitelo", "conchelo", "corbelo", "cotobelo", "couselo", "destelo", "desvelo", "esfácelo", "fandelo", "fardelo", "farelo", "farnelo", "flabelo", "ganchelo", "garfelo", "involucelo", "mantelo", "montelo", "outerelo", "padicelo", "pesadelo", "pinguelo", "piquelo", "rampelo", "rastrelo", "restelo", "tornecelo", "trabelo", "restrelo", "portelo", "ourelo", "zarapelo")),
    RslpRule("eta", 3, "", Array("arqueta", "atleta", "avoceta", "baioneta", "baldeta", "banqueta", "barraganeta", "barreta", "borleta", "buceta", "caceta", "calceta", "caldeta", "cambeta", "canaleta", "caneta", "carreta", "cerceta", "chaparreta", "chapeta", "chareta", "chincheta", "colcheta", "cometa", "corbeta", "corveta", "cuneta", "desteta", "espeta", "espoleta", "estafeta", "esteta", "faceta", "falanxeta", "frasqueta", "gaceta", "gabeta", "galleta", "garabeta", "gaveta", "glorieta", "lagareta", "lambeta", "lanceta", "libreta", "maceta", "macheta", "maleta", "malleta", "mareta", "marreta", "meseta", "mofeta", "muleta", "peseta", "planeta", "raqueta", "regreta", "saqueta", "veleta", "vendeta", "viñeta")),
    RslpRule("ete", 3, "", Array("alfinete", "ariete", "bacinete", "banquete", "barallete", "barrete", "billete", "binguelete", "birrete", "bonete", "bosquete", "bufete", "burlete", "cabalete", "cacahuete", "cavinete", "capacete", "carrete", "casarete", "casete", "chupete", "clarinete", "colchete", "colete", "capete", "curupete", "disquete", "estilete", "falsete", "ferrete", "filete", "gallardete", "gobelete", "inglete", "machete", "miquelete", "molete", "mosquete", "piquete", "ribete", "rodete", "rolete", "roquete", "sorvete", "vedete", "vendete")),
    RslpRule("ica", 3, "", Array("andarica", "botánica", "botica", "dialéctica", "dinámica", "física", "formica", "gráfica", "marica", "túnica")),
    RslpRule("ico", 3, "", Array("conico", "acetifico", "acidifico")),
    RslpRule("exo", 3, "", Array("arpexo", "arquexo", "asexo", "axexo", "azulexo", "badexo", "bafexo", "bocexo", "bosquexo", "boubexo", "cacarexo", "carrexo", "cascarexo", "castrexo", "convexo", "cotexo", "desexo", "despexo", "forcexo", "gabexo", "gargarexo", "gorgolexo", "inconexo", "manexo", "merexo", "narnexo", "padexo", "patexo", "sopexo", "varexo")),
    RslpRule("exa", 3, "", Array("airexa", "bandexa", "carrexa", "envexa", "igrexa", "larexa", "patexa", "presexa", "sobexa")),
    RslpRule("idão", 3, "", Array()),
    RslpRule("iño", 3, "o", Array("camiño", "cariño", "comiño", "golfiño", "padriño", "sobriño", "viciño", "veciño")),
    RslpRule("iña", 3, "a", Array("camariña", "campiña", "entreliña", "espiña", "fariña", "moriña", "valiña")),
    RslpRule("ito", 3, "", Array()),
    RslpRule("ita", 3, "", Array()),
    RslpRule("oide", 3, "", Array("anaroide", "aneroide", "asteroide", "axoide", "cardioide", "celuloide", "coronoide", "discoide", "espermatozoide", "espiroide", "esquizoide", "esteroide", "glenoide", "linfoide", "hemorroide", "melaloide", "sacaroide", "tetraploide", "varioloide")),
    RslpRule("ola", 3, "", Array("aixola", "ampola", "argola", "arola", "arteríola", "bandola", "bítola", "bractéola", "cachola", "carambola", "carapola", "carola", "carrandiola", "catrapola", "cebola", "centola", "champola", "chatola", "cirola", "cítola", "consola", "corola", "empola", "escarola", "esmola", "estola", "fitola", "florícola", "garañola", "gárgola", "garxola", "glicocola", "góndola", "mariola", "marola", "michola", "pirola", "rebola", "rupícola", "saxícola", "sémola", "tachola", "tómbola")),
    RslpRule("olo", 3, "", Array("arrolo", "babiolo", "cacharolo", "caixarolo", "carolo", "carramolo", "cascarolo", "cirolo", "codrolo", "correolo", "cotrolo", "desconsolo", "rebolo", "repolo", "subsolo", "tixolo", "tómbolo", "torolo", "trémolo", "vacúolo", "xermolo", "zócolo")),
    RslpRule("ote", 3, "", Array("aigote", "alcaiote", "barbarote", "balote", "billote", "cachote", "camarote", "capote", "cebote", "chichote", "citote", "cocorote", "escote", "gañote", "garrote", "gavote", "lamote", "lapote", "larapote", "lingote", "lítote", "magote", "marrote", "matalote", "pandote", "paparote", "rebote", "tagarote", "zarrote")),
    RslpRule("ota", 3, "", Array("asíntota", "caiota", "cambota", "chacota", "compota", "creosota", "curota", "derrota", "díspota", "gamota", "maniota", "pelota", "picota", "pillota", "pixota", "queirota", "remota")),
    RslpRule("cho", 3, "", Array("abrocho", "arrocho", "carocho", "falucho", "bombacho", "borracho", "mostacho")),
    RslpRule("cha", 3, "", Array("borracha", "carracha", "estacha", "garnacha", "limacha", "remolacha", "abrocha")),
    RslpRule("uco", 4, "", Array("caduco", "estuco", "fachuco", "malluco", "saluco", "trabuco")),
    RslpRule("uzo", 3, "", Array("carriñouzo", "fachuzo", "mañuzo", "mestruzo", "tapuzo")),
    RslpRule("uza", 3, "", Array("barruza", "chamuza", "chapuza", "charamuza", "conduza", "deduza", "desluza", "entreluza", "induza", "reluza", "seduza", "traduza", "trasluza")),
    RslpRule("uxa", 3, "", Array("caramuxa", "carrabouxa", "cartuxa", "coruxa", "curuxa", "gaturuxa", "maruxa", "meruxa", "miruxa", "moruxa", "muruxa", "papuxa", "rabuxa", "trouxa")),
    RslpRule("uxo", 3, "", Array("caramuxo", "carouxo", "carrabouxo", "curuxo", "debuxo", "ganduxo", "influxo", "negouxo", "pertuxo", "refluxo")),
    RslpRule("ello", 3, "", Array("alborello", "artello", "botello", "cachafello", "calello", "casarello", "cazabello", "cercello", "cocerello", "concello", "consello", "desparello", "escaravello", "espello", "fedello", "fervello", "gagafello", "gorrobello", "nortello", "pendello", "troupello", "trebello")),
    RslpRule("ella", 3, "", Array("alborella", "bertorella", "bocatella", "botella", "calella", "cercella", "gadella", "grosella", "lentella", "movella", "nocella", "noitevella", "parella", "pelella", "percebella", "segorella", "sabella"))
  ))

  private val stepNoun = RslpStep(4, Array(), wholeWordExceptions = false, Array(
    RslpRule("dade", 3, "", Array("acridade", "calidade")),
    RslpRule("ificar", 2, "", Array()),
    RslpRule("eiro", 3, "", Array("agoireiro", "bardalleiro", "braseiro", "barreiro", "canteiro", "capoeiro", "carneiro", "carteiro", "cinceiro", "faroleiro", "mareiro", "preguiceiro", "quinteiro", "raposeiro", "retranqueiro", "regueiro", "sineiro", "troleiro", "ventureiro")),
    RslpRule("eira", 3, "", Array("cabeleira", "canteira", "cocheira", "folleira", "milleira")),
    RslpRule("ario", 3, "", Array("armario", "calcario", "lionario", "salario")),
    RslpRule("aria", 3, "", Array("cetaria", "coronaria", "fumaria", "linaria", "lunaria", "parietaria", "saponaria", "serpentaria")),
    RslpRule("ístico", 3, "", Array("balístico", "ensaístico")),
    RslpRule("ista", 3, "", Array("batista", "ciclista", "fadista", "operista", "tenista", "verista")),
    RslpRule("ado", 2, "", Array("grado", "agrado")),
    RslpRule("ato", 2, "", Array("agnato")),
    RslpRule("ido", 3, "", Array("cándido", "cândido", "consolido", "decidido", "duvido", "marido", "rápido")),
    RslpRule("ida", 3, "", Array("bastida", "dúbida", "dubida", "duvida", "ermida", "éxida", "guarida", "lapicida", "medida", "morida")),
    RslpRule("ída", 3, "", Array()),
    RslpRule("ido", 3, "", Array()),
    RslpRule("udo", 3, "", Array("estudo", "escudo")),
    RslpRule("uda", 3, "", Array()),
    RslpRule("ada", 3, "", Array("abada", "alhada", "allada", "pitada")),
    RslpRule("dela", 3, "", Array("cambadela", "cavadela", "forcadela", "erisipidela", "mortadela", "espadela", "fondedela", "picadela", "arandela", "candela", "cordela", "escudela", "pardela")),
    RslpRule("ela", 3, "", Array("canela", "capela", "cotela", "cubela", "curupela", "escarapela", "esparrela", "estela", "fardela", "flanela", "fornela", "franela", "gabela", "gamela", "gavela", "glumela", "granicela", "lamela", "lapela", "malvela", "manela", "manganela", "mexarela", "micela", "mistela", "novela", "ourela", "panela", "parcela", "pasarela", "patamela", "patela", "paxarela", "pipela", "pitela", "postela", "pubela", "restela", "sabela", "salmonela", "secuela", "sentinela", "soldanela", "subela", "temoncela", "tesela", "tixela", "tramela", "trapela", "varela", "vitela", "xanela", "xestela")),
    RslpRule("ábel", 2, "", Array("afábel", "fiábel")),
    RslpRule("íbel", 2, "", Array("críbel", "imposíbel", "posíbel", "fisíbel", "falíbel")),
    RslpRule("nte", 3, "", Array("alimente", "adiante", "acrescente", "elefante", "frequente", "freqüente", "gigante", "instante", "oriente", "permanente", "posante", "possante", "restaurante")),
    RslpRule("ncia", 3, "", Array()),
    RslpRule("nza", 3, "", Array()),
    RslpRule("acia", 3, "", Array("acracia", "audacia", "falacia", "farmacia")),
    RslpRule("icia", 3, "", Array("caricia", "delicia", "ledicia", "malicia", "milicia", "noticia", "pericia", "presbicia", "primicia", "regalicia", "sevicia", "tiricia")),
    RslpRule("iza", 3, "", Array("alvariza", "baliza", "cachiza", "caniza", "cañiza", "carbaliza", "carriza", "chamariza", "chapiza", "fraguiza", "latiza", "longaniza", "mañiza", "nabiza", "peliza", "preguiza", "rabiza")),
    RslpRule("exar", 3, "", Array("palmexar")),
    RslpRule("ación", 2, "", Array("aeración")),
    RslpRule("ición", 3, "", Array("condición", "gornición", "monición", "nutrición", "petición", "posición", "sedición", "volición")),
    RslpRule("ción", 3, "t", Array()),
    RslpRule("sión", 3, "s", Array("abrasión", "alusión")),
    RslpRule("azón", 2, "", Array("armazón")),
    RslpRule("ón", 3, "", Array("abalón", "acordeón", "alción", "aldrabón", "alerón", "aliñón", "ambón", "bombón", "calzón", "campón", "canalón", "cantón", "capitón", "cañón", "centón", "ciclón", "collón", "colofón", "copón", "cotón", "cupón", "petón", "tirón", "tourón", "turón", "unción", "versión", "zubón", "zurrón")),
    RslpRule("ona", 3, "", Array("abandona", "acetona", "aleurona", "amazona", "anémona", "bombona", "cambona", "carona", "chacona", "charamona", "cincona", "condona", "cortisona", "cretona", "cretona", "detona", "estona", "fitohormona", "fregona", "gerona", "hidroquinona", "hormona", "lesiona", "madona", "maratona", "matrona", "metadona", "monótona", "neurona", "pamplona", "peptona", "poltrona", "proxesterona", "quinona", "quinona", "silicona", "sulfona")),
    RslpRule("oa", 3, "", Array("abandoa", "madroa", "barbacoa", "estoa", "airoa", "eiroa", "amalloa", "ámboa", "améndoa", "anchoa", "antinéboa", "avéntoa", "avoa", "bágoa", "balboa", "bisavoa", "boroa", "canoa", "caroa", "comadroa", "coroa", "éngoa", "espácoa", "filloa", "fírgoa", "grañoa", "lagoa", "lanzoa", "magoa", "mámoa", "morzoa", "noiteboa", "noraboa", "parañoa", "persoa", "queiroa", "rañoa", "táboa", "tataravoa", "teiroa")),
    RslpRule("aco", 3, "", Array()),
    RslpRule("aca", 3, "", Array("alpaca", "barraca", "bullaca", "buraca", "carraca", "casaca", "cavaca", "cloaca", "entresaca", "ervellaca", "espinaca", "estaca", "farraca", "millaca", "pastinaca", "pataca", "resaca", "urraca", "purraca")),
    RslpRule("al", 4, "", Array("afinal", "animal", "estatal", "bisexual", "bissexual", "desleal", "fiscal", "formal", "pessoal", "persoal", "liberal", "postal", "virtual", "visual", "pontual", "puntual", "homosexual", "heterosexual")),
    RslpRule("dor", 2, "", Array("abaixador")),
    RslpRule("tor", 3, "", Array("autor", "motor", "pastor", "pintor")),
    RslpRule("or", 2, "", Array("asesor", "assessor", "favor", "mellor", "melhor", "redor", "rigor", "sensor", "tambor", "tumor")),
    RslpRule("ora", 3, "", Array("albacora", "anáfora", "áncora", "apisoadora", "ardora", "ascospora", "aurora", "avéspora", "bitácora", "canéfora", "cantimplora", "catáfora", "cepilladora", "demora", "descalcificadora", "diáspora", "empacadora", "epífora", "ecavadora", "escora", "eslora", "espora", "fotocompoñedora", "fotocopiadora", "grampadora", "isícora", "lavadora", "lixadora", "macrospora", "madrépora", "madrágora", "masora", "mellora", "metáfora", "microspora", "milépora", "milpéndora", "nécora", "oospora", "padeadora", "pasiflora", "pécora", "píldora", "pólvora", "ratinadora", "rémora", "retroescavadora", "sófora", "torradora", "trémbora", "uredospora", "víbora", "víncora", "zoospora")),
    RslpRule("aría", 3, "", Array("libraría")),
    RslpRule("axe", 3, "", Array("aluaxe", "amaraxe", "amperaxe", "bagaxe", "balaxe", "barcaxe", "borraxe", "bescaxe", "cabotaxe", "carraxe", "cartilaxe", "chantaxe", "colaxe", "coraxe", "carruaxe", "dragaxe", "embalaxe", "ensilaxe", "epistaxe", "fagundaxe", "fichaxe", "fogaxe", "forraxe", "fretaxe", "friaxe", "garaxe", "homenaxe", "leitaxe", "liñaxe", "listaxe", "maraxe", "marcaxe", "maridaxe", "masaxe", "miraxe", "montaxe", "pasaxe", "peaxe", "portaxe", "ramaxe", "rebelaxe", "rodaxe", "romaxe", "sintaxe", "sondaxe", "tiraxe", "vantaxe", "vendaxe", "viraxe")),
    RslpRule("dizo", 3, "", Array()),
    RslpRule("eza", 3, "", Array("alteza", "beleza", "fereza", "fineza", "vasteza", "vileza")),
    RslpRule("ez", 3, "", Array("acidez", "adultez", "adustez", "avidez", "candidez", "mudez", "nenez", "nudez", "pomez")),
    RslpRule("engo", 3, "", Array()),
    RslpRule("ego", 3, "", Array("corego", "derrego", "entrego", "lamego", "sarego", "sartego")),
    RslpRule("oso", 3, "", Array("afanoso", "algoso", "caldoso", "caloso", "cocoso", "ditoso", "favoso", "fogoso", "lamoso", "mecoso", "mocoso", "precioso", "rixoso", "venoso", "viroso", "xesoso")),
    RslpRule("osa", 3, "", Array("mucosa", "glicosa", "baldosa", "celulosa", "isoglosa", "nitrocelulosa", "levulosa", "ortosa", "pectosa", "preciosa", "sacarosa", "serosa", "ventosa")),
    RslpRule("ume", 3, "", Array("agrume", "albume", "alcume", "batume", "cacume", "cerrume", "chorume", "churume", "costume", "curtume", "estrume", "gafume", "legume", "perfume", "queixume", "zarrume")),
    RslpRule("ura", 3, "", Array("albura", "armadura", "imatura", "costura")),
    RslpRule("iñar", 3, "", Array()),
    RslpRule("il", 3, "", Array("abril", "alfil", "anil", "atril", "badil", "baril", "barril", "brasil", "cadril", "candil", "cantil", "carril", "chamil", "chancil", "civil", "cubil", "dátil", "difícil", "dócil", "edil", "estéril", "fácil", "fráxil", "funil", "fusil", "grácil", "gradil", "hábil", "hostil", "marfil")),
    RslpRule("esco", 4, "", Array()),
    RslpRule("isco", 4, "", Array()),
    RslpRule("ivo", 3, "", Array("pasivo", "positivo", "passivo", "possessivo", "posesivo", "pexotarivo", "relativo"))
  ))

  private val stepVerb = RslpStep(2, Array(), wholeWordExceptions = false, Array(
    RslpRule("aba", 2, "", Array()),
    RslpRule("abade", 2, "", Array()),
    RslpRule("ábade", 2, "", Array()),
    RslpRule("abamo", 2, "", Array()),
    RslpRule("ábamo", 2, "", Array()),
    RslpRule("aban", 2, "", Array()),
    RslpRule("ache", 2, "", Array()),
    RslpRule("ade", 2, "", Array()),
    RslpRule("an", 2, "", Array()),
    RslpRule("ando", 2, "", Array()),
    RslpRule("ar", 2, "", Array("azar", "bazar", "patamar")),
    RslpRule("arade", 2, "", Array()),
    RslpRule("aramo", 2, "", Array()),
    RslpRule("arán", 2, "", Array()),
    RslpRule("aran", 2, "", Array()),
    RslpRule("árade", 2, "", Array()),
    RslpRule("aría", 2, "", Array()),
    RslpRule("ariade", 2, "", Array()),
    RslpRule("aríade", 2, "", Array()),
    RslpRule("arian", 2, "", Array()),
    RslpRule("ariamo", 2, "", Array()),
    RslpRule("aron", 2, "", Array()),
    RslpRule("ase", 2, "", Array()),
    RslpRule("asede", 2, "", Array()),
    RslpRule("ásede", 2, "", Array()),
    RslpRule("asemo", 2, "", Array()),
    RslpRule("ásemo", 2, "", Array()),
    RslpRule("asen", 2, "", Array()),
    RslpRule("avan", 2, "", Array()),
    RslpRule("aríamo", 2, "", Array()),
    RslpRule("assen", 2, "", Array()),
    RslpRule("ássemo", 2, "", Array()),
    RslpRule("eríamo", 2, "", Array()),
    RslpRule("êssemo", 2, "", Array()),
    RslpRule("iríamo", 3, "", Array()),
    RslpRule("íssemo", 3, "", Array()),
    RslpRule("áramo", 2, "", Array()),
    RslpRule("árei", 2, "", Array()),
    RslpRule("aren", 2, "", Array()),
    RslpRule("aremo", 2, "", Array()),
    RslpRule("aríei", 2, "", Array()),
    RslpRule("ássei", 2, "", Array()),
    RslpRule("ávamo", 2, "", Array()),
    RslpRule("êramo", 1, "", Array()),
    RslpRule("eremo", 1, "", Array()),
    RslpRule("eríei", 1, "", Array()),
    RslpRule("êssei", 1, "", Array()),
    RslpRule("íramo", 3, "", Array()),
    RslpRule("iremo", 3, "", Array()),
    RslpRule("iríei", 3, "", Array()),
    RslpRule("íssei", 3, "", Array()),
    RslpRule("issen", 3, "", Array()),
    RslpRule("endo", 1, "", Array()),
    RslpRule("indo", 3, "", Array()),
    RslpRule("ondo", 3, "", Array()),
    RslpRule("arde", 2, "", Array()),
    RslpRule("arei", 2, "", Array()),
    RslpRule("aria", 2, "", Array()),
    RslpRule("armo", 2, "", Array()),
    RslpRule("asse", 2, "", Array()),
    RslpRule("aste", 2, "", Array()),
    RslpRule("ávei", 2, "", Array()),
    RslpRule("erão", 1, "", Array()),
    RslpRule("erde", 1, "", Array()),
    RslpRule("erei", 1, "", Array()),
    RslpRule("êrei", 1, "", Array()),
    RslpRule("eren", 2, "", Array()),
    RslpRule("eria", 1, "", Array()),
    RslpRule("ermo", 1, "", Array()),
    RslpRule("este", 1, "", Array("faroeste", "agreste")),
    RslpRule("íamo", 1, "", Array()),
    RslpRule("ian", 2, "", Array("enfian", "eloxian", "ensaian")),
    RslpRule("irde", 2, "", Array()),
    RslpRule("irei", 3, "", Array("admirei")),
    RslpRule("iren", 3, "", Array()),
    RslpRule("iria", 3, "", Array()),
    RslpRule("irmo", 3, "", Array()),
    RslpRule("isse", 3, "", Array()),
    RslpRule("iste", 4, "", Array()),
    RslpRule("iava", 1, "", Array("ampliava")),
    RslpRule("amo", 2, "", Array()),
    RslpRule("iona", 3, "", Array()),
    RslpRule("ara", 2, "", Array("arara", "prepara")),
    RslpRule("ará", 2, "", Array("alvará", "bacará")),
    RslpRule("are", 2, "", Array("prepare")),
    RslpRule("ava", 2, "", Array("agrava")),
    RslpRule("emo", 2, "", Array()),
    RslpRule("era", 1, "", Array("acelera", "espera")),
    RslpRule("erá", 1, "", Array()),
    RslpRule("ere", 1, "", Array("espere")),
    RslpRule("íei", 1, "", Array()),
    RslpRule("in", 3, "", Array()),
    RslpRule("imo", 3, "", Array("reprimo", "intimo", "íntimo", "nimo", "queimo", "ximo")),
    RslpRule("ira", 3, "", Array("fronteira", "sátira")),
    RslpRule("ído", 3, "", Array()),
    RslpRule("irá", 3, "", Array()),
    RslpRule("tizar", 4, "", Array("alfabetizar")),
    RslpRule("izar", 3, "", Array("organizar")),
    RslpRule("itar", 5, "", Array("acreditar", "explicitar", "estreitar")),
    RslpRule("ire", 3, "", Array("adquire")),
    RslpRule("omo", 3, "", Array()),
    RslpRule("ai", 2, "", Array()),
    RslpRule("ear", 4, "", Array("alardear", "nuclear")),
    RslpRule("uei", 3, "", Array()),
    RslpRule("uía", 5, "u", Array()),
    RslpRule("ei", 3, "", Array()),
    RslpRule("er", 1, "", Array("éter", "pier")),
    RslpRule("eu", 1, "", Array("chapeu")),
    RslpRule("ia", 1, "", Array("estória", "fatia", "acia", "praia", "elogia", "mania", "lábia", "aprecia", "polícia", "arredia", "cheia", "ásia")),
    RslpRule("ir", 3, "", Array()),
    RslpRule("iu", 3, "", Array()),
    RslpRule("eou", 5, "", Array()),
    RslpRule("ou", 3, "", Array()),
    RslpRule("i", 1, "", Array()),
    RslpRule("ede", 1, "", Array("rede", "bípede", "céspede", "parede", "palmípede", "vostede", "hóspede", "adrede")),
    RslpRule("ei", 3, "", Array()),
    RslpRule("en", 2, "", Array()),
    RslpRule("erade", 1, "", Array()),
    RslpRule("érade", 1, "", Array()),
    RslpRule("eran", 2, "", Array()),
    RslpRule("eramo", 1, "", Array()),
    RslpRule("éramo", 1, "", Array()),
    RslpRule("erán", 1, "", Array()),
    RslpRule("ería", 1, "", Array()),
    RslpRule("eriade", 1, "", Array()),
    RslpRule("eríade", 1, "", Array()),
    RslpRule("eriamo", 1, "", Array()),
    RslpRule("erian", 1, "", Array()),
    RslpRule("erían", 1, "", Array()),
    RslpRule("eron", 1, "", Array()),
    RslpRule("ese", 1, "", Array()),
    RslpRule("esedes", 1, "", Array()),
    RslpRule("ésedes", 1, "", Array()),
    RslpRule("esemo", 1, "", Array()),
    RslpRule("ésemo", 1, "", Array()),
    RslpRule("esen", 1, "", Array()),
    RslpRule("êssede", 1, "", Array()),
    RslpRule("ía", 1, "", Array()),
    RslpRule("iade", 1, "", Array()),
    RslpRule("íade", 1, "", Array()),
    RslpRule("iamo", 1, "", Array()),
    RslpRule("ían", 1, "", Array()),
    RslpRule("iche", 1, "", Array()),
    RslpRule("ide", 1, "", Array()),
    RslpRule("irade", 3, "", Array()),
    RslpRule("írade", 3, "", Array()),
    RslpRule("iramo", 3, "", Array()),
    RslpRule("irán", 3, "", Array()),
    RslpRule("iría", 3, "", Array()),
    RslpRule("iriade", 3, "", Array()),
    RslpRule("iríade", 3, "", Array()),
    RslpRule("iriamo", 3, "", Array()),
    RslpRule("irian", 3, "", Array()),
    RslpRule("irían", 3, "", Array()),
    RslpRule("iron", 3, "", Array()),
    RslpRule("ise", 3, "", Array()),
    RslpRule("isede", 3, "", Array()),
    RslpRule("ísede", 3, "", Array()),
    RslpRule("isemo", 3, "", Array()),
    RslpRule("ísemo", 3, "", Array()),
    RslpRule("isen", 3, "", Array()),
    RslpRule("íssede", 3, "", Array()),
    RslpRule("tizar", 3, "", Array("alfabetizar")),
    RslpRule("ondo", 3, "", Array())
  ))

  private val stepVowel = RslpStep(4, Array(), wholeWordExceptions = false, Array(
    RslpRule("gue", 2, "g", Array("azougue", "dengue", "merengue", "nurague", "merengue", "rengue")),
    RslpRule("que", 2, "c", Array("alambique", "albaricoque", "abaroque", "alcrique", "almadraque", "almanaque", "arenque", "arinque", "baduloque", "ballestrinque", "betoque", "bivaque", "bloque", "bodaque", "bosque", "breque", "buque", "cacique", "cheque", "claque", "contradique", "coque", "croque", "dique", "duque", "enroque", "espeque", "estoque", "estoraque", "estraloque", "estrinque", "milicroque", "monicreque", "orinque", "arinque", "palenque", "parque", "penique", "picabeque", "pique", "psique", "raque", "remolque", "xeque", "repenique", "roque", "sotobosque", "tabique", "tanque", "toque", "traque", "truque", "vivaque", "xaque")),
    RslpRule("a", 3, "", Array("amasadela", "cerva")),
    RslpRule("e", 3, "", Array("marte")),
    RslpRule("o", 3, "", Array("barro", "fado", "cabo", "libro", "cervo")),
    RslpRule("â", 3, "", Array()),
    RslpRule("ã", 3, "", Array("amanhã", "arapuã", "fã", "divã", "manhã")),
    RslpRule("ê", 3, "", Array()),
    RslpRule("ô", 3, "", Array()),
    RslpRule("á", 3, "", Array()),
    RslpRule("é", 3, "", Array()),
    RslpRule("ó", 3, "", Array()),
    RslpRule("i", 3, "", Array())
  ))


  /** `GalicianStemmer.stem`: plural, unification, adverb, augmentative to a
    * LENGTH fixpoint, noun (verb only when noun left the LENGTH unchanged —
    * the reference compares lengths, not contents), vowel, accent fold. */
  def stem(w: String): String = {
    var s = stepPlural(w)
    s = stepUnification(s)
    s = stepAdverb(s)
    var oldLen = -1
    while (s.length != oldLen) {
      oldLen = s.length
      s = stepAugmentative(s)
    }
    oldLen = s.length
    s = stepNoun(s)
    if (s.length == oldLen) s = stepVerb(s)
    s = stepVowel(s)
    val b = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      b.append(s.charAt(i) match {
        case '\u00e1' => 'a'
        case '\u00e9' | '\u00ea' => 'e'
        case '\u00ed' => 'i'
        case '\u00f3' => 'o'
        case '\u00fa' => 'u'
        case c => c
      })
      i += 1
    }
    b.toString
  }
}

/** Galician analysis chain (`gl/GalicianAnalyzer.java:115`): standard →
  * lowercase → stop → RSLP stem (stop runs BEFORE stemming, on the
  * lowercased form). */
final case class GalicianAnalyzer(stopWords: Set[String] = Analyzers.GalicianStopWords)
    extends Analyzer {
  override val name = "galician"
  override def tokenize(text: String): IndexedSeq[Token] = {
    val out = Vector.newBuilder[Token]
    tokenizeRaw(text, (src, s, e, pos) => out += Token(src.substring(s, e), pos))
    out.result()
  }
  override def tokenizeRaw(text: String, sink: TokenSink): Unit = {
    var pos = 0
    SnowballAnalyzers.standardRawTokens(text).foreach { raw =>
      val lower = raw.toLowerCase(java.util.Locale.ROOT)
      if (!stopWords.contains(lower)) {
        val stemmed = GalicianStem.stem(lower)
        sink.accept(stemmed, 0, stemmed.length, pos)
      }
      pos += 1
    }
  }
}
