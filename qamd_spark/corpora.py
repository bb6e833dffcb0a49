"""Embedded, frozen seed corpora for the hashed char-n-gram models.

The reference pipeline family uses fastText lid.176 for language ID and a
KenLM-style n-gram LM for perplexity (BASELINE.json north_star). Neither
model artifact is available offline in this sandbox, so we ship a small
deterministic substitute: per-language character-trigram tables built at
import time from the frozen text below. The text is original generic prose
(written for this repo); determinism is the requirement, not linguistic
coverage — the synthetic test corpus is drawn from the same style family.

Do NOT edit casually: the tables derived from these strings define the
reference labels (oracle output) bit-for-bit.
"""

EN = """
the quick brown fox jumps over the lazy dog while the sun sets behind the
hills and the river keeps flowing toward the quiet sea. every morning the
baker opens the shop and the smell of fresh bread drifts across the square.
children walk to school along the old stone road and talk about the games
they will play in the afternoon. the library on the corner keeps a small
collection of maps and letters from a century ago. when the rain comes the
streets empty quickly and people gather under the awnings to wait. a good
cup of tea and a long book make the slow evenings feel shorter. the train
leaves the station at seven and arrives in the city just before nine. we
measured the results carefully and wrote down every number in the ledger.
the committee will meet on tuesday to review the budget and plan the next
quarter. history teaches patience and the garden teaches it twice. please
remember to close the gate so the sheep do not wander onto the road. the
engineer checked the bridge again because the winter had been hard on the
steel. most of the answers were simple once the question was stated well.
"""

FR = """
le petit matin se lève sur la ville et les rues sentent le pain chaud et le
café. les enfants marchent vers l'école en parlant des jeux de l'après-midi.
la bibliothèque du quartier garde une collection de cartes et de lettres du
siècle dernier. quand la pluie arrive les gens s'abritent sous les arcades
et attendent en regardant le ciel. une tasse de thé et un long livre rendent
les soirées plus douces. le train part de la gare à sept heures et arrive en
ville juste avant neuf heures. nous avons mesuré les résultats avec soin et
noté chaque nombre dans le registre. le comité se réunira mardi pour revoir
le budget et préparer le prochain trimestre. l'histoire enseigne la patience
et le jardin l'enseigne deux fois. n'oubliez pas de fermer la barrière pour
que les moutons ne sortent pas sur la route. l'ingénieur a vérifié le pont
encore une fois parce que l'hiver avait été dur pour l'acier. la plupart des
réponses étaient simples une fois la question bien posée.
"""

DE = """
der frühe morgen liegt über der stadt und die straßen riechen nach frischem
brot und kaffee. die kinder gehen zur schule und sprechen über die spiele
des nachmittags. die bibliothek an der ecke bewahrt eine kleine sammlung von
karten und briefen aus dem letzten jahrhundert. wenn der regen kommt leeren
sich die straßen schnell und die leute warten unter den vordächern. eine
tasse tee und ein langes buch machen die langsamen abende kürzer. der zug
verlässt den bahnhof um sieben und kommt kurz vor neun in der stadt an. wir
haben die ergebnisse sorgfältig gemessen und jede zahl in das buch
geschrieben. der ausschuss trifft sich am dienstag um das budget zu prüfen
und das nächste quartal zu planen. die geschichte lehrt geduld und der
garten lehrt sie zweimal. bitte denkt daran das tor zu schließen damit die
schafe nicht auf die straße laufen. der ingenieur prüfte die brücke noch
einmal weil der winter hart für den stahl gewesen war. die meisten antworten
waren einfach sobald die frage gut gestellt war.
"""

ES = """
la mañana temprana cubre la ciudad y las calles huelen a pan recién hecho y
a café. los niños caminan hacia la escuela hablando de los juegos de la
tarde. la biblioteca de la esquina guarda una pequeña colección de mapas y
cartas del siglo pasado. cuando llega la lluvia las calles se vacían rápido
y la gente espera bajo los toldos mirando el cielo. una taza de té y un
libro largo hacen más cortas las tardes lentas. el tren sale de la estación
a las siete y llega a la ciudad justo antes de las nueve. medimos los
resultados con cuidado y anotamos cada número en el registro. el comité se
reunirá el martes para revisar el presupuesto y planear el próximo
trimestre. la historia enseña paciencia y el jardín la enseña dos veces. por
favor recuerden cerrar la puerta para que las ovejas no salgan al camino. el
ingeniero revisó el puente otra vez porque el invierno había sido duro para
el acero. la mayoría de las respuestas eran simples una vez que la pregunta
estaba bien planteada.
"""

IT = """
il primo mattino copre la città e le strade profumano di pane fresco e di
caffè. i bambini camminano verso la scuola parlando dei giochi del
pomeriggio. la biblioteca all'angolo conserva una piccola raccolta di mappe
e lettere del secolo scorso. quando arriva la pioggia le strade si svuotano
in fretta e la gente aspetta sotto i portici guardando il cielo. una tazza
di tè e un libro lungo rendono più brevi le sere lente. il treno parte
dalla stazione alle sette e arriva in città poco prima delle nove. abbiamo
misurato i risultati con cura e annotato ogni numero nel registro. il
comitato si riunirà martedì per rivedere il bilancio e pianificare il
prossimo trimestre. la storia insegna la pazienza e il giardino la insegna
due volte. per favore ricordate di chiudere il cancello perché le pecore
non escano sulla strada. l'ingegnere ha controllato di nuovo il ponte
perché l'inverno era stato duro per l'acciaio. la maggior parte delle
risposte era semplice una volta posta bene la domanda.
"""

PT = """
a manhã cedo cobre a cidade e as ruas cheiram a pão fresco e a café. as
crianças caminham para a escola falando dos jogos da tarde. a biblioteca da
esquina guarda uma pequena coleção de mapas e cartas do século passado.
quando chega a chuva as ruas esvaziam depressa e as pessoas esperam sob os
toldos olhando o céu. uma xícara de chá e um livro longo tornam mais curtas
as tardes lentas. o trem sai da estação às sete e chega à cidade pouco
antes das nove. medimos os resultados com cuidado e anotamos cada número no
registro. o comitê vai se reunir na terça para rever o orçamento e planejar
o próximo trimestre. a história ensina paciência e o jardim a ensina duas
vezes. por favor lembrem de fechar o portão para que as ovelhas não saiam
para a estrada. o engenheiro verificou a ponte outra vez porque o inverno
tinha sido duro para o aço. a maioria das respostas era simples depois que
a pergunta estava bem colocada.
"""

NL = """
de vroege ochtend ligt over de stad en de straten ruiken naar vers brood en
koffie. de kinderen lopen naar school en praten over de spelletjes van de
middag. de bibliotheek op de hoek bewaart een kleine verzameling kaarten en
brieven uit de vorige eeuw. als de regen komt lopen de straten snel leeg en
wachten de mensen onder de luifels naar de lucht te kijken. een kop thee en
een lang boek maken de trage avonden korter. de trein vertrekt om zeven uur
van het station en komt kort voor negen in de stad aan. wij hebben de
resultaten zorgvuldig gemeten en elk getal in het boek geschreven. de
commissie komt dinsdag bijeen om de begroting te bekijken en het volgende
kwartaal te plannen. de geschiedenis leert geduld en de tuin leert het twee
keer. denk eraan het hek te sluiten zodat de schapen niet de weg op lopen.
de ingenieur controleerde de brug nog een keer omdat de winter zwaar was
geweest voor het staal. de meeste antwoorden waren eenvoudig zodra de vraag
goed gesteld was.
"""

SV = """
den tidiga morgonen ligger över staden och gatorna doftar av färskt bröd
och kaffe. barnen går till skolan och pratar om eftermiddagens lekar.
biblioteket i hörnet bevarar en liten samling kartor och brev från förra
århundradet. när regnet kommer tömmer sig gatorna snabbt och folk väntar
under markiserna och tittar på himlen. en kopp te och en lång bok gör de
långsamma kvällarna kortare. tåget lämnar stationen klockan sju och kommer
fram till staden strax före nio. vi mätte resultaten noggrant och skrev ner
varje tal i boken. kommittén träffas på tisdag för att granska budgeten och
planera nästa kvartal. historien lär ut tålamod och trädgården lär ut det
två gånger. kom ihåg att stänga grinden så att fåren inte springer ut på
vägen. ingenjören kontrollerade bron en gång till eftersom vintern hade
varit hård mot stålet. de flesta svaren var enkla när frågan väl var rätt
ställd.
"""

PL = """
wczesnym rankiem miasto budzi się powoli a na ulicach pachnie świeży chleb
i kawa. dzieci idą do szkoły starą kamienną drogą i rozmawiają o zabawach
które będą po południu. biblioteka na rogu przechowuje mały zbiór map i
listów sprzed stu lat. kiedy przychodzi deszcz ludzie chowają się pod
arkadami i czekają patrząc na niebo. filiżanka herbaty i długa książka
sprawiają że powolne wieczory wydają się krótsze. pociąg odjeżdża ze stacji
o siódmej i przyjeżdża do miasta tuż przed dziewiątą. zmierzyliśmy wyniki
uważnie i zapisaliśmy każdą liczbę w zeszycie. komisja spotka się we wtorek
aby przejrzeć budżet i zaplanować następny kwartał. historia uczy
cierpliwości a ogród uczy jej dwa razy. pamiętaj proszę zamknąć bramę żeby
owce nie wyszły na drogę. inżynier jeszcze raz sprawdził most ponieważ zima
była ciężka dla stali. większość odpowiedzi była prosta gdy pytanie zostało
dobrze postawione.
"""

FI = """
aikaisin aamulla kaupunki herää hitaasti ja kaduilla tuoksuu tuore leipä ja
kahvi. lapset kävelevät kouluun vanhaa kivistä tietä pitkin ja puhuvat
iltapäivän leikeistä. kulman kirjasto säilyttää pientä kokoelmaa karttoja
ja kirjeitä sadan vuoden takaa. kun sade tulee ihmiset menevät kaarien alle
ja odottavat katsellen taivasta. kuppi teetä ja pitkä kirja tekevät
hitaista illoista lyhyempiä. juna lähtee asemalta seitsemältä ja saapuu
kaupunkiin juuri ennen yhdeksää. mittasimme tulokset huolellisesti ja
kirjoitimme jokaisen luvun vihkoon. toimikunta kokoontuu tiistaina
tarkastamaan talousarvion ja suunnittelemaan seuraavan neljänneksen.
historia opettaa kärsivällisyyttä ja puutarha opettaa sitä kahdesti.
muista sulkea portti jotta lampaat eivät karkaa tielle. insinööri tarkisti
sillan vielä kerran koska talvi oli ollut kova teräkselle. useimmat
vastaukset olivat yksinkertaisia kun kysymys oli esitetty hyvin.
"""

TR = """
sabahın erken saatlerinde şehir yavaşça uyanır ve sokaklarda taze ekmek ile
kahve kokusu yayılır. çocuklar eski taş yoldan okula yürür ve öğleden
sonraki oyunları konuşur. köşedeki kütüphane yüz yıl öncesinden kalma küçük
bir harita ve mektup koleksiyonu saklar. yağmur geldiğinde insanlar
kemerlerin altına sığınır ve gökyüzüne bakarak bekler. bir fincan çay ve
uzun bir kitap yavaş akşamları daha kısa gösterir. tren istasyondan yedide
kalkar ve şehre dokuzdan hemen önce varır. sonuçları dikkatle ölçtük ve her
sayıyı deftere yazdık. komite salı günü toplanıp bütçeyi gözden geçirecek
ve gelecek çeyreği planlayacak. tarih sabrı öğretir ve bahçe bunu iki kez
öğretir. koyunlar yola çıkmasın diye lütfen kapıyı kapatmayı unutma.
mühendis köprüyü bir kez daha kontrol etti çünkü kış çelik için çok sert
geçmişti. soru iyi sorulunca cevapların çoğu basitti.
"""

ID = """
pagi pagi sekali kota bangun perlahan dan jalanan berbau roti segar serta
kopi. anak anak berjalan ke sekolah melewati jalan batu tua sambil
membicarakan permainan sore nanti. perpustakaan di sudut menyimpan koleksi
kecil peta dan surat dari seratus tahun lalu. ketika hujan datang orang
orang berteduh di bawah lengkungan dan menunggu sambil memandang langit.
secangkir teh dan buku yang panjang membuat malam yang lambat terasa lebih
pendek. kereta berangkat dari stasiun pukul tujuh dan tiba di kota tepat
sebelum pukul sembilan. kami mengukur hasilnya dengan teliti dan menulis
setiap angka di buku catatan. panitia akan bertemu hari selasa untuk
meninjau anggaran dan merencanakan kuartal berikutnya. sejarah mengajarkan
kesabaran dan kebun mengajarkannya dua kali. tolong ingat menutup gerbang
supaya domba tidak keluar ke jalan. insinyur memeriksa jembatan sekali lagi
karena musim dingin sangat keras bagi baja. sebagian besar jawaban menjadi
sederhana setelah pertanyaannya diajukan dengan baik.
"""

ZH = """
清晨的城市慢慢醒来，街道上飘着新鲜面包和咖啡的香气。孩子们沿着老石板路走向学校，
一边谈论下午要玩的游戏。街角的图书馆保存着一小批一百年前的地图和信件。下雨的时候
街道很快就空了，人们聚在屋檐下等待，一边看着天空。一杯热茶和一本长长的书让缓慢的
夜晚显得短一些。火车七点从车站出发，九点之前刚好到达城里。我们仔细测量了结果，并
把每一个数字都记在账本里。委员会星期二开会，审查预算并计划下一个季度。历史教人耐
心，花园把这件事教了两遍。请记得关上大门，免得羊群跑到路上去。工程师又检查了一遍
桥梁，因为冬天对钢铁来说太严酷了。大多数答案其实很简单，只要问题问得清楚。市场在
周末最热闹，摊位上摆满了蔬菜水果和手工做的小点心。老人们坐在广场边下棋，偶尔抬头
看一眼路过的行人。傍晚的风从河面吹来，带着水草和泥土的气息。
"""

JA = """
朝はやく町がゆっくりと目をさまし、通りには焼きたてのパンとコーヒーの香りがただよう。
子どもたちは古い石畳の道を歩いて学校へ向かい、午後の遊びについて話している。角の図書
館には百年前の地図や手紙の小さな収蔵がある。雨が降ると通りはすぐに人気がなくなり、
人々はひさしの下に集まって空を見ながら待つ。温かいお茶と長い本があれば、ゆっくりした
夜も短く感じられる。汽車は七時に駅を出て、九時少し前に町へ着く。わたしたちは結果を丁
寧に測り、すべての数字を帳面に書きとめた。委員会は火曜日に集まり、予算を見直して次の
四半期の計画を立てる。歴史は忍耐を教え、庭はそれを二度教える。羊が道に出ないように、
門を閉めるのを忘れないでください。冬が鋼にとって厳しかったので、技師は橋をもう一度点
検した。問いがきちんと立てられれば、答えの多くは単純だった。週末の市場はにぎやかで、
屋台には野菜や果物や手作りの菓子が並ぶ。夕方の風は川面から吹いてきて、水草と土の匂い
を運んでくる。
"""

KO = """
이른 아침 도시가 천천히 깨어나고 거리에는 갓 구운 빵과 커피 냄새가 흐른다. 아이들은
오래된 돌길을 따라 학교로 걸어가며 오후에 할 놀이 이야기를 나눈다. 모퉁이 도서관에는
백 년 전의 지도와 편지가 조금 보관되어 있다. 비가 오면 거리는 금세 비고 사람들은
처마 밑에 모여 하늘을 바라보며 기다린다. 따뜻한 차 한 잔과 긴 책 한 권이 느린 저녁을
짧게 만들어 준다. 기차는 일곱 시에 역을 떠나 아홉 시 조금 전에 도시에 도착한다. 우리는
결과를 꼼꼼히 재고 모든 숫자를 장부에 적었다. 위원회는 화요일에 모여 예산을 검토하고
다음 분기를 계획한다. 역사는 인내를 가르치고 정원은 그것을 두 번 가르친다. 양들이
길로 나가지 않도록 문을 꼭 닫아 주세요. 겨울이 강철에 혹독했기 때문에 기술자는 다리를
다시 점검했다. 질문이 잘 정리되면 대부분의 답은 단순했다. 주말 시장은 가장 붐비고
좌판에는 채소와 과일과 손으로 만든 과자가 가득하다. 저녁 바람은 강에서 불어와 물풀과
흙의 냄새를 실어 온다.
"""

RU = """
ранним утром город медленно просыпается и улицы пахнут свежим хлебом и
кофе. дети идут в школу по старой каменной дороге и говорят об играх,
которые будут играть после обеда. библиотека на углу хранит небольшое
собрание карт и писем столетней давности. когда приходит дождь, улицы
быстро пустеют и люди ждут под навесами, глядя на небо. чашка чая и
длинная книга делают медленные вечера короче. поезд отходит от станции в
семь и прибывает в город незадолго до девяти. мы тщательно измерили
результаты и записали каждое число в тетрадь. комитет соберётся во вторник,
чтобы рассмотреть бюджет и спланировать следующий квартал. история учит
терпению, а сад учит ему дважды. пожалуйста, не забудьте закрыть ворота,
чтобы овцы не вышли на дорогу. инженер ещё раз проверил мост, потому что
зима была тяжёлой для стали. большинство ответов оказались простыми, когда
вопрос был хорошо поставлен. в выходные рынок самый шумный, прилавки полны
овощей, фруктов и домашней выпечки. вечерний ветер дует с реки и приносит
запах травы и земли.
"""

AR = """
في الصباح الباكر تستيقظ المدينة ببطء وتفوح من الشوارع رائحة الخبز الطازج
والقهوة. يمشي الأطفال إلى المدرسة على الطريق الحجري القديم ويتحدثون عن
الألعاب التي سيلعبونها بعد الظهر. تحتفظ المكتبة في الزاوية بمجموعة صغيرة من
الخرائط والرسائل من قبل مئة عام. عندما يأتي المطر تفرغ الشوارع بسرعة ويجتمع
الناس تحت المظلات ينتظرون وهم ينظرون إلى السماء. كوب من الشاي وكتاب طويل
يجعلان الأمسيات البطيئة أقصر. يغادر القطار المحطة في السابعة ويصل إلى
المدينة قبل التاسعة بقليل. قسنا النتائج بعناية وكتبنا كل رقم في الدفتر.
تجتمع اللجنة يوم الثلاثاء لمراجعة الميزانية وتخطيط الربع القادم. يعلم
التاريخ الصبر ويعلمه البستان مرتين. من فضلكم تذكروا إغلاق البوابة حتى لا
تخرج الخراف إلى الطريق. فحص المهندس الجسر مرة أخرى لأن الشتاء كان قاسيا على
الفولاذ. كانت معظم الإجابات بسيطة متى طرح السؤال بشكل جيد. السوق في نهاية
الأسبوع أكثر ازدحاما والأكشاك مليئة بالخضار والفواكه والحلوى المصنوعة
يدويا. تهب ريح المساء من النهر وتحمل رائحة العشب والتراب.
"""

LANG_CORPORA = {
    "en": EN, "fr": FR, "de": DE, "es": ES,
    "it": IT, "pt": PT, "nl": NL, "sv": SV,
    "pl": PL, "fi": FI, "tr": TR, "id": ID,
    "zh": ZH, "ja": JA, "ko": KO, "ru": RU, "ar": AR,
}

# Scripts written without word-separating whitespace: `\s+` tokenization
# is meaningless there, so every consumer that windows or tokenizes a
# corpus goes through corpus_tokens() (char-level for these, split()
# elsewhere). The langid/perplexity model itself needs no tokenizer —
# it is byte-trigram based, and UTF-8 multi-byte sequences give CJK
# scripts naturally disjoint trigram support.
UNSEGMENTED_LANGS = frozenset({"zh", "ja"})


def corpus_tokens(lang: str) -> list:
    """Script-aware token list for a frozen corpus: whitespace words for
    segmented scripts, individual non-space characters for unsegmented
    CJK (zh/ja) — no `\\s+` dependence on scripts that never use it."""
    text = LANG_CORPORA[lang]
    if lang in UNSEGMENTED_LANGS:
        return [ch for ch in text if not ch.isspace()]
    return text.split()

# English stopword lexicon (broadcast side input; analogue of the
# reference's test/stopwords.txt mechanism, reference
# src/check/dictionary.rs:22-24). Frozen.
STOPWORDS = (
    "a an and are as at be but by for from has have he her his i in is it "
    "its of on or she that the their them they this to was were will with "
    "you your we our not no so if then than do does did what which who"
).split()

# Synthetic profanity lexicon (toxicity side input; planted pseudo-words so
# tests contain no real slurs — FIXTURES.md §2).
PROFANITY = ["fraktz", "blorgak", "smegwit", "drekhole"]
